#!/usr/bin/env python
"""Spot-check named ``queries()`` entries against their ``oracle_sql()``
on a bare session — the single-query version of rehearse_driver.py.

    cd /tmp && python /root/repo/scripts/check_queries.py q1 q2 ...
    (sf_dir via $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.6g}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_canon(df):
    cols = sorted(df.columns)
    return cols, sorted(tuple(canon(v) for v in row)
                        for row in df[cols].itertuples(index=False,
                                                       name=None))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    names = sys.argv[1:]
    if not names:
        print("usage: check_queries.py <query> [<query> ...]")
        return 2
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    qs, oracles = e.queries(), e.oracle_sql()
    bad = 0
    for name in names:
        spdf = qs[name](spark, SF).toPandas()
        if name not in oracles:
            print(f"rows-only  {name} rows={len(spdf)}")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        sc, sr = rows_canon(spdf)
        oc, orows = rows_canon(odf)
        if sc != oc:
            bad += 1
            print(f"SCHEMA MISMATCH {name}: spark={sc} oracle={oc}")
        elif sr != orows:
            bad += 1
            print(f"VALUE MISMATCH {name}: rows spark={len(sr)} "
                  f"oracle={len(orows)}")
            for a, b in list(zip(sr, orows))[:5]:
                if a != b:
                    print(f"  spark  {a}\n  oracle {b}")
        else:
            print(f"ok         {name} rows={len(sr)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
