"""Driver-facing named queries + DuckDB oracles.

Each entry exercises one operator family from SURVEY.md §2 over the
driver's parquet tables (`/root/testdata/sf*/`).  The SSTable cell
model (key, name, state, data, timestamp, ttl, expiration, generation)
is derived *deterministically* from the ``events`` table so the same
derivation is expressible in ANSI SQL for the oracle — the driver's
correctness gate compares row count + schema + order-insensitive value
hash at sf0.01.

Conventions (driver compare sorts columns by name then hashes values):
- every computed column is aliased identically in Spark and SQL;
- outputs use string/int/double columns only (binary render as string
  via UTF-8 or base64 — FIXTURES.md oracle notes);
- any time arithmetic is on explicit epoch integers, never wall clock.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators import (
    explode_cells,
    live_view,
    lww_cell,
    lww_row,
)

# Fixed as-of point for TTL visibility: 2026-01-01T00:00:00Z (ms).
AS_OF_MS = 1767225600000

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # The driver session may lack our session defaults; the testdata
    # parquet uses TIMESTAMP(NANOS), readable only as nano-epoch longs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def ts_us(col: str | F.Column) -> F.Column:
    """nano-epoch long → µs epoch long (timestamps arrive as nanos).

    NB: ``long / int`` in Spark SQL is DOUBLE division — at nano-epoch
    magnitude (~1.7e18 > 2^53) that rounds.  Decimal division is exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("decimal(38,0)") / F.lit(1000)).cast("long")


def ts_ms(col: str | F.Column) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c.cast("decimal(38,0)") / F.lit(1000000)).cast("long")


def as_timestamp(col: str | F.Column) -> F.Column:
    """nano-epoch long → TimestampType (µs precision) for date functions."""
    return F.timestamp_micros(ts_us(col))


# ---------------------------------------------------------------------------
# SSTable cell model derived from `events`
#
# key    = user_id (string)          name = event_type
# ts(µs) = event time                generation = event_id % 4 + 1
# state  = DELETED if value < 10, EXPIRING if value > 200, else NORMAL
# data   = props JSON (NULL when DELETED)
# expiration(ms) = event ms + (event_id%3 * 500 + 30) days  (EXPIRING)
#   → mix of expired / unexpired relative to AS_OF_MS
# ---------------------------------------------------------------------------

_DAY_MS = 86400000


def derived_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    state = (F.when(F.col("value") < 10, "DELETED")
              .when(F.col("value") > 200, "EXPIRING")
              .otherwise("NORMAL"))
    expiring = F.col("value") > 200
    return ev.select(
        F.encode(F.col("user_id").cast("string"), "UTF-8").alias("key"),
        F.encode(F.col("event_type"), "UTF-8").alias("name"),
        state.alias("state"),
        F.when(F.col("value") < 10, F.lit(None).cast("binary"))
         .otherwise(F.encode(F.col("props"), "UTF-8")).alias("data"),
        ts_us("ts").alias("timestamp"),
        F.when(expiring, F.lit(86400)).cast("long").alias("ttl"),
        F.when(expiring,
               ts_ms("ts")
               + ((F.col("event_id") % 3) * 500 + 30) * _DAY_MS)
         .cast("long").alias("expiration"),
        (F.col("event_id") % 4 + 1).cast("int").alias("generation"),
    )


# The same derivation as a DuckDB CTE.
_CELLS_CTE = f"""
WITH cells AS (
    SELECT cast(user_id AS varchar)                           AS key_str,
           event_type                                         AS name_str,
           CASE WHEN value < 10 THEN 'DELETED'
                WHEN value > 200 THEN 'EXPIRING'
                ELSE 'NORMAL' END                             AS state,
           CASE WHEN value < 10 THEN NULL ELSE props END      AS data_str,
           epoch_us(ts)                                       AS ts_us,
           CASE WHEN value > 200
                THEN epoch_ms(ts) + ((event_id % 3) * 500 + 30) * {_DAY_MS}
                ELSE NULL END                                 AS expiration,
           cast(event_id % 4 + 1 AS int)                      AS generation
    FROM events
)
"""

# Deterministic LWW total order (SURVEY.md §2.4) in DuckDB terms;
# matches operators.lww._order_key exactly (base64 of UTF-8 bytes).
_ORDER = ("ts_us DESC, CASE state WHEN 'DELETED' THEN 2 WHEN 'EXPIRING' "
          "THEN 1 ELSE 0 END DESC, generation DESC, "
          "coalesce(to_base64(encode(data_str)), '') DESC, "
          "to_base64(encode(name_str)) DESC")


def _render_winners(df: DataFrame) -> DataFrame:
    return df.select(
        F.decode(F.col("key"), "UTF-8").alias("key_str"),
        F.decode(F.col("name"), "UTF-8").alias("name_str"),
        F.col("state"),
        F.coalesce(F.decode(F.col("data"), "UTF-8"), F.lit("")).alias("data_str"),
        F.col("timestamp").alias("ts_us"),
        F.col("generation"),
    )


@query("flagship_lww_merge", oracle=f"""
{_CELLS_CTE}
SELECT key_str, name_str, state, coalesce(data_str, '') AS data_str,
       ts_us, generation
FROM cells
QUALIFY row_number() OVER (PARTITION BY key_str, name_str
                           ORDER BY {_ORDER}) = 1
""")
def flagship_lww_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 pipeline: explode → per-cell LWW across generations (A1+A3).
    One shuffle with map-side partial aggregation."""
    return _render_winners(lww_cell(derived_cells(spark, sf_dir)))


@query("lww_row_coarse", oracle=f"""
{_CELLS_CTE}
SELECT key_str, name_str, state, ts_us, generation
FROM cells
QUALIFY row_number() OVER (PARTITION BY key_str ORDER BY {_ORDER}) = 1
""")
def lww_row_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the reference's coarse row-grained merge — single newest cell
    of the entire row (SSTableData.scala:45-62)."""
    return lww_row(derived_cells(spark, sf_dir)).select(
        F.decode(F.col("key"), "UTF-8").alias("key_str"),
        F.decode(F.col("name"), "UTF-8").alias("name_str"),
        F.col("state"), F.col("timestamp").alias("ts_us"),
        F.col("generation"))


@query("live_view_asof", oracle=f"""
{_CELLS_CTE}
SELECT key_str, name_str, state, coalesce(data_str, '') AS data_str,
       ts_us, generation
FROM cells
QUALIFY row_number() OVER (PARTITION BY key_str, name_str
                           ORDER BY {_ORDER}) = 1
   AND state != 'DELETED'
   AND (expiration IS NULL OR expiration > {AS_OF_MS})
""")
def live_view_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5: winners minus tombstones minus expired-at-AS_OF."""
    return _render_winners(live_view(derived_cells(spark, sf_dir), AS_OF_MS))


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(_ORACLES)
