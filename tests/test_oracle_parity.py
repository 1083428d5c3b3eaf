"""Driver-gate rehearsal: run every ``queries()`` entry at sf0.01 and
compare against its ``oracle_sql()`` twin via DuckDB — row count, schema
column names, and order-insensitive values (what CORRECTNESS_r{N}.json
checks)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rows_canon(df):
    """pandas → sorted list of canonical row tuples, columns sorted by
    name (the driver sorts columns by name before hashing)."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon(v) for v in row))
    out.sort()
    return cols, out


def _query_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    spdf = sdf.toPandas()
    if oracle is None:
        assert len(spdf) >= 0  # rows-only check, mirrors driver behavior
        return
    con = _duck()
    ddf = con.sql(oracle).df()
    assert len(spdf) == len(ddf), f"{name}: rowcount {len(spdf)} != {len(ddf)}"
    scols, srows = _rows_canon(spdf)
    dcols, drows = _rows_canon(ddf)
    assert scols == dcols, f"{name}: schema {scols} != {dcols}"
    if srows != drows:
        diff_a = [r for r in srows if r not in set(drows)][:5]
        diff_b = [r for r in drows if r not in set(srows)][:5]
        raise AssertionError(
            f"{name}: value mismatch; spark-only={diff_a} duck-only={diff_b}")


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.schema is not None


def test_driver_window_curated():
    """The driver's correctness gate checks the first 50 registrations.
    Pin the curated window: every name in _DRIVER_WINDOW must exist
    (no typos silently shrinking the window), nothing is lost by the
    reordering, and previously never-driver-checked queries sit inside
    the first 50."""
    from sstable_hadoop_spark import queries as q

    names = list(q.all_queries())
    assert len(names) == len(q._QUERIES)  # reorder loses nothing
    missing = [n for n in q._DRIVER_WINDOW if n not in q._QUERIES]
    assert not missing, f"window names not registered: {missing}"
    window = set(names[:50])
    # round-5 curation: the never-driver-checked pair, the newly-oracled
    # trio, this round's new/touched code, and the regression core
    must_cover = {
        "sstable_winner_index", "cassandra_summary_splits",
        "msgpack_sink_lines", "sstable_split_manifest",
        "multimodal_real_decode", "multimodal_video_frames",
        "streaming_lww_flush", "streaming_flush_roundtrip",
        "dedup_minhash_lsh", "flagship_lww_merge",
        "approx_distinct_users", "write_sink_roundtrip",
    }
    assert must_cover <= window, f"missing from window: {must_cover - window}"
    # oracles follow the same ordering
    assert [n for n in names if n in q._ORACLES][:10] == \
        [n for n in q.all_oracles()][:10]
