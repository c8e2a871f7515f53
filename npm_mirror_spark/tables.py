"""Loaders for the driver's synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an ``sf_dir``.

Every loader is a plain ``spark.read.parquet`` so Catalyst sees a native
file scan: predicate pushdown, column pruning and (if the layout had
partition dirs) partition pruning all apply with zero custom code.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


_NS_COLS_CACHE: dict[str, list[str]] = {}


def _nanos_ts_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS), which Spark cannot
    read natively (PARQUET_TYPE_ILLEGAL). One driver-side footer read —
    memoized per path: the footer schema of a given file never changes
    within a process, and query paths call this once per table load
    (hundreds of times per bench run), so the repeated file opens were
    pure driver-side overhead (guide §5: the driver should do almost no
    data work)."""
    import pyarrow as pa

    cached = _NS_COLS_CACHE.get(path)
    if cached is not None:
        return cached
    schema = pq.read_schema(path)
    cols = [
        f.name
        for f in schema
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]
    _NS_COLS_CACHE[path] = cols
    return cols


def _as_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to plain ``timestamp`` (LTZ).

    Spark 4.x infers parquet timestamp columns written without the UTC flag
    as TIMESTAMP_NTZ, which functions like ``unix_micros`` reject. The
    session TZ is pinned UTC (below), so the cast is value-preserving and
    oracle hashes stay valid.
    """
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # timestamps must collect as UTC-naive to match the DuckDB oracle —
    # pin the session TZ here so a driver-created session with a local TZ
    # gets identical values (runtime-settable, like nanosAsLong below).
    # Both conf pins are once-per-session (flagged on the session object):
    # each set() is a py4j round-trip, and query paths load tables
    # hundreds of times per bench run.
    if not getattr(spark, "_npm_mirror_conf_pinned", False):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark._npm_mirror_conf_pinned = True
    path = f"{sf_dir}/{name}.parquet"
    ns_cols = _nanos_ts_columns(path)
    if ns_cols:
        # read nanos as long, then truncate to microsecond timestamps —
        # integer division keeps full precision (a double round-trip would
        # lose bits at 1.7e18 ns epochs). DuckDB's TIMESTAMP_NS -> python
        # datetime truncates the same way, so oracle values agree.
        df = spark.read.parquet(path)
        for c in ns_cols:
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return _as_ltz(df)
    return _as_ltz(spark.read.parquet(path))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so operators can also be exercised
    through ``spark.sql`` — same Catalyst plan either way."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
