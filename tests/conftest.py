from __future__ import annotations

import pytest

from knetminer_etl_spark.runtime import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="knetminer-etl-spark-tests",
        master="local[4]",
        conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.driver.memory": "4g",
            "spark.ui.enabled": "false",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def people_df(spark):
    return spark.createDataFrame(
        [
            ("A1", "Alice", 30, None),
            ("A2", "Bob", 25, "note-b"),
            (None, "Ghost", 1, "skipme"),
            ("A2", "Bobby", 7, ""),
        ],
        "accession string, name string, age int, note string",
    )
