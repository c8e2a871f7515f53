"""Loader contract: every table arrives with driver-comparable types no
matter which Spark version's parquet type inference is in effect. The
Spark 4.x upgrade silently turned no-UTC-flag timestamps into
TIMESTAMP_NTZ (rejected by unix_micros and friends) and broke three
queries with zero code change — these tests make the next such inference
shift fail HERE, loudly, instead of deep inside a query."""

from __future__ import annotations

import pytest
from pyspark.sql.types import TimestampNTZType

from npm_mirror_spark.tables import TABLE_NAMES, load_table


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_no_ntz_columns_survive_load(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    assert ntz == [], f"{name}: TIMESTAMP_NTZ leaked through load_table: {ntz}"


def test_events_ts_usable_by_epoch_functions(spark, sf_dir):
    """The exact call shape that broke under Spark 4.1.2: unix_micros on
    the events timestamp must analyze and execute."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    n = ev.select(F.unix_micros("ts").alias("us")).filter("us IS NOT NULL").count()
    assert n > 0
