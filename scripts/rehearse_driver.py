#!/usr/bin/env python
"""Driver-gate rehearsal: run every ``queries()`` entry on a BARE
SparkSession (exactly what the driver does — none of our session
defaults) and compare against ``oracle_sql()`` via DuckDB.

Run from a cwd OUTSIDE the repo to also catch worker-shipping issues:

    cd /tmp && python /root/repo/scripts/rehearse_driver.py [sf_dir]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
                        for row in df[cols].itertuples(index=False, name=None))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    fails, n_ok, n_rows_only = [], 0, 0
    for name in sorted(qs):
        try:
            spdf = qs[name](spark, SF).toPandas()
            o = oracles.get(name)
            if o is None:
                n_rows_only += 1
                print(f"rows-only  {name} rows={len(spdf)}", flush=True)
                continue
            ddf = con.sql(o).df()
            if len(spdf) != len(ddf):
                fails.append((name, f"rowcount {len(spdf)}≠{len(ddf)}"))
                continue
            sc, sr = rows_canon(spdf)
            dc, dr = rows_canon(ddf)
            if sc != dc:
                fails.append((name, f"schema {sc}≠{dc}"))
                continue
            if sr != dr:
                fails.append((name, "values"))
                continue
            n_ok += 1
            print(f"ok         {name} rows={len(spdf)}", flush=True)
        except Exception as ex:  # noqa: BLE001 - report and continue
            fails.append((name, f"EXC {type(ex).__name__}: {str(ex)[:120]}"))
    print(f"\nSUMMARY total={len(qs)} ok={n_ok} rows-only={n_rows_only} "
          f"fails={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
