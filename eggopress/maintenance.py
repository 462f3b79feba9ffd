"""Table maintenance: small-file compaction.

Streaming appends (streaming.py) land one chunk-file set per micro-batch,
so a long-lived table's scan cost grows with FILE count even when data
volume doesn't — the classic small-files problem every Iceberg/Hive
deployment compacts away (Iceberg's rewrite_data_files; the reference has
no analog because eggo writes each dataset exactly once).

Chunk rows are immutable and self-describing (codec + params ride in the
blob header), so compaction never touches a codec: it is a pure
file-level rewrite — read the fat partitions' chunk rows, one shuffle on
the partition key so each source=/salt= dir is written by one task as one
file, then the same staging/atomic-promote path the encoder uses. Decoded
bytes are identical before and after (tested with exceptAll both ways).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import SparkSession, functions as F

from eggopress import lineage as lineagelib
from eggopress.tablefmt import Table


def partition_file_counts(tbl: Table) -> dict[str, int]:
    """partition_id -> number of chunk parquet files on disk."""
    out: dict[str, int] = {}
    for pid in tbl.partition_dirs():
        d = os.path.join(tbl.data_dir, pid)
        out[pid] = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
    return out


def compact_table(spark: SparkSession, table_path: str, *,
                  min_files: int = 2, run_id: str | None = None) -> dict:
    """Rewrite every partition holding >= min_files chunk files into one
    file each. Untouched partitions keep their files byte-for-byte. Each
    rewritten partition gets a lineage row (stage='compact'); the snapshot
    is re-committed with the same totals (compaction moves no rows)."""
    tbl = Table(table_path)
    snap = tbl.snapshot()
    if snap is None or snap.get("stage") != "encoded":
        raise ValueError(f"no encoded table at {table_path}")
    run_id = run_id or f"compact-{uuid.uuid4().hex[:8]}"
    t0 = time.time()

    fat = {p: n for p, n in partition_file_counts(tbl).items() if n >= min_files}
    if not fat:
        return {"run_id": run_id, "compacted_partitions": 0, "files_before": 0,
                "files_after": 0, "wall_s": 0.0}

    paths = [os.path.join(tbl.data_dir, p) for p in sorted(fat)]
    # basePath keeps the source=/salt= columns when reading partition
    # subdirs directly (only the fat partitions are rewritten or even read)
    chunks = spark.read.option("basePath", tbl.data_dir).parquet(*paths)
    staging = tbl.staging_dir(run_id)
    (
        chunks.repartition("source", "salt")
        .write.partitionBy("source", "salt")
        .option("compression", "uncompressed")
        .mode("overwrite")
        .parquet(staging)
    )
    promoted = tbl.promote_partitions(run_id)  # replace semantics
    after = partition_file_counts(tbl)
    now_ms = int((time.time() - t0) * 1000)
    lineagelib.append(spark, tbl, [
        (run_id, pid, "compact", "done", 1,
         f"files:{fat[pid]}->{after.get(pid, 0)}", None, None, None, now_ms)
        for pid in sorted(fat)
    ])
    snap = dict(tbl.snapshot() or {})
    snap["stage"] = "encoded"
    snap["partitions"] = tbl.partition_dirs()
    snap["last_compaction"] = run_id
    tbl.commit_snapshot(snap)
    return {
        "run_id": run_id,
        "compacted_partitions": len(promoted),
        "files_before": sum(fat.values()),
        "files_after": sum(after.get(p, 0) for p in fat),
        "wall_s": round(time.time() - t0, 3),
    }
