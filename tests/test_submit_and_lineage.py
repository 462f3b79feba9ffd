"""spark-submit --py-files launch test (the north rule's mandated launch
mode) + verify-stage lineage."""

import json
import os
import subprocess
import zipfile

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(tmp_path):
    """Package the engine as a zip and run a full encode+decode round trip
    through bin/spark-submit --py-files — the cluster launch path."""
    import pyspark

    zpath = tmp_path / "eggopress.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "eggopress")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    job = tmp_path / "job.py"
    table = tmp_path / "tbl"
    job.write_text(
        f"""
import json
from pyspark.sql import SparkSession
spark = (SparkSession.builder.appName("submit-test")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from eggopress import decode, encode, synth, verify
df = synth.corpus_df(spark, 1000)
s = encode.encode_table(spark, df, {str(table)!r}, n_partitions=4)
ok = verify.roundtrip_ok(df, decode.decode_table(spark, {str(table)!r}))
print("RESULT " + json.dumps({{"rows": s["rows"], "ok": ok}}))
spark.stop()
"""
    )
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    out = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", str(zpath), str(job)],
        capture_output=True, text=True, timeout=300,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, out.stderr[-2000:]
    res = json.loads(lines[0][7:])
    assert res == {"rows": 1000, "ok": True}


def test_verify_stage_lineage(spark, tmp_path):
    from eggopress import encode, lineage, synth, verify
    from eggopress.tablefmt import Table

    path = str(tmp_path / "tbl")
    corpus = synth.corpus_df(spark, 1000)
    corpus.cache().count()
    encode.encode_table(spark, corpus, path, n_partitions=4)
    report = verify.verify_table(spark, path, corpus)
    assert report["roundtrip_ok"] and report["mismatches"] == 0

    lin = lineage.read(spark, Table(path))
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert stages == {"encode", "verify"}
    vrows = lin.filter(F.col("stage") == "verify").collect()
    assert vrows and all(r["status"] == "done" for r in vrows)
