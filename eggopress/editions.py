"""Editions: parallel materializations of one logical table.

Engine analog of the reference's dataset editions (docs/spec.md:62-74:
``basic`` nested, ``flat`` via the ADAM flattener, ``locuspart``
Hive-partitioned, ``flat_locuspart``). Here the encoded chunk table is the
primary storage; an edition is a decoded materialization:

    basic           decoded corpus parquet (doc_id, tokens, n_tok, source)
    flat            token-level rows (doc_id, source, pos, token) — the
                    nested->flat duality (toast.sh:49 parent__child analog)
    locuspart       basic, partitioned by source (toast.sh:51-53 analog)
    flat_locuspart  flat, partitioned by source
    packed[:ctx]    fixed-context training sequences (source, pack_id,
                    tokens[<=ctx], n_tok) from the concat-then-chunk
                    packing pass (default ctx 2048), partitioned by
                    source — the edition a training job reads directly

Editions are recorded in the table snapshot (the edition catalog), so a
reader discovers them without scanning directories.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from eggopress.tablefmt import Table

EDITIONS = ("basic", "flat", "locuspart", "flat_locuspart", "packed")


def edition_df(spark: SparkSession, table_path: str, edition: str) -> DataFrame:
    """The edition's logical DataFrame (decoded lazily, not materialized)."""
    from eggopress import decode

    base = decode.decode_table(spark, table_path)
    if edition in ("basic", "locuspart"):
        return base
    if edition in ("flat", "flat_locuspart"):
        return base.select(
            "doc_id", "source", F.posexplode("tokens").alias("pos", "token")
        )
    if edition == "packed" or edition.startswith("packed:"):
        from eggopress.pipeline import textstats

        ctx = int(edition.split(":", 1)[1]) if ":" in edition else 2048
        return textstats.pack_sequences(base, ctx=ctx, materialize=True)
    raise ValueError(f"unknown edition {edition!r}; valid: {EDITIONS}")


def materialize(spark: SparkSession, table_path: str, edition: str,
                out_path: str | None = None) -> str:
    """Write an edition to parquet and record it in the snapshot catalog."""
    tbl = Table(table_path)
    if tbl.snapshot() is None:
        raise ValueError(f"no snapshot at {table_path}: encode first")
    out = out_path or os.path.join(tbl.path, "editions", edition)
    df = edition_df(spark, table_path, edition)
    writer = df.write.mode("overwrite")
    if edition in ("locuspart", "flat_locuspart") or \
            edition.startswith("packed"):
        writer = writer.partitionBy("source")
    writer.parquet(out)

    snap = dict(tbl.snapshot() or {})
    eds = dict(snap.get("editions", {}))
    eds[edition] = out
    snap["editions"] = eds
    tbl.commit_snapshot(snap)
    return out


def list_editions(table_path: str) -> dict[str, str]:
    snap = Table(table_path).snapshot() or {}
    return dict(snap.get("editions", {}))
