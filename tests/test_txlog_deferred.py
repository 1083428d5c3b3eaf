"""Deferred r13 txlog/matview driver rows (queries.py tail):
oracle-verified against DuckDB here — exactly the driver gate's
comparison — pending free slots in the rotation window (r13
registration; see SKILL.md).  Fixtures run their own convergence
assertions inside build() (no-rewrite DV deletes, time travel,
replayed-refresh no-op, metadata-count cross-check)."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")

DEFERRED = ["txlog_dv_delete_roundtrip", "txlog_zorder_range",
            "matview_refresh_row", "txlog_count_row",
            "docs_link_components", "docs_link_triangles",
            "txlog_overwrite_roundtrip", "txlog_restore_roundtrip"]


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    out = con.execute(sql).fetchall()
    con.close()
    return sorted(tuple(r) for r in out)


@pytest.mark.parametrize("name", DEFERRED)
def test_deferred_txlog_matches_duckdb(spark, name):
    from sstable_hadoop_spark import queries as q

    fn = getattr(q, name)
    got = sorted(tuple(r) for r in fn(spark, SF).collect())
    want = _duck(q._DEFERRED_ORACLES[name])
    assert got, f"{name} returned no rows at {SF}"
    assert got == want, name


def test_deferred_txlog_rows_are_not_registered():
    """The r12 window is exactly full — these must stay out of
    `queries()` until their r13 slots open (registering one would
    silently displace a rotation-due row)."""
    from sstable_hadoop_spark import queries as q

    for name in DEFERRED:
        assert name not in q._QUERIES, name
        assert name in q._DEFERRED_ORACLES, name
