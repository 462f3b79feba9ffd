import os
import shutil

import pytest


@pytest.fixture(scope="session")
def spark():
    from eggopress.conf import session_builder

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = (
        session_builder("eggopress-tests", cores=4, shuffle=8)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture()
def scratch(tmp_path):
    d = str(tmp_path / "scratch")
    os.makedirs(d, exist_ok=True)
    yield d
    shutil.rmtree(d, ignore_errors=True)
