"""Spark catalog registration for eggopress tables (SURVEY.md S6).

Engine analog of the reference's Hive DDL registration
(`CREATE EXTERNAL TABLE ... STORED AS PARQUET LOCATION ...`,
datasets/dbsnp/toast.sh:50-51; the planned `eggo register`,
docs/spec.md:142-144): after registration a user runs plain
``spark.sql(...)`` over the table without touching the engine API.

Registered surfaces for a table named ``t``:
    t           decoded corpus view (doc_id, tokens, n_tok, source)
    t_chunks    the encoded chunk table (CREATE TABLE ... USING parquet
                LOCATION <data dir> — the durable catalog entry)
    t_manifest  per-column-chunk codec/stats manifest
    t_lineage   provenance/checkpoint rows
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from eggopress.tablefmt import Table


def _check_name(name: str) -> str:
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"invalid table name: {name!r}")
    return name


def register(spark: SparkSession, table_path: str, name: str) -> dict:
    """Register an encoded table in the Spark catalog + decoded view."""
    from eggopress import decode, lineage

    name = _check_name(name)
    tbl = Table(table_path)
    if tbl.snapshot() is None:
        raise ValueError(f"no snapshot at {table_path}: encode first")
    if "'" in tbl.data_dir:
        # the LOCATION literal below is single-quoted; a quote in the path
        # would break out of the DDL statement
        raise ValueError(f"table path must not contain a quote: {tbl.data_dir!r}")

    spark.sql(f"DROP TABLE IF EXISTS {name}_chunks")
    # the data dir is hive-partitioned (source=/salt=), so the catalog
    # entry must declare the partition columns and then recover them —
    # a bare LOCATION table would see zero files
    chunk_schema = spark.read.parquet(tbl.data_dir).schema
    part_cols = ("source", "salt")
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in chunk_schema.fields
    )
    spark.sql(
        f"CREATE TABLE {name}_chunks ({cols}) USING parquet "
        f"PARTITIONED BY ({', '.join(part_cols)}) LOCATION '{tbl.data_dir}'"
    )
    spark.catalog.recoverPartitions(f"{name}_chunks")
    spark.read.parquet(tbl.manifest_dir).createOrReplaceTempView(f"{name}_manifest")
    lineage.read(spark, tbl).createOrReplaceTempView(f"{name}_lineage")
    decode.decode_table(spark, table_path).createOrReplaceTempView(name)
    return {
        "table": name,
        "surfaces": [name, f"{name}_chunks", f"{name}_manifest", f"{name}_lineage"],
        "location": tbl.data_dir,
    }
