"""Z-order (Morton) clustering for multi-column scan pruning.

A 100 TB table is usually filtered on more than one column, but a
single sort order only prunes for its leading column.  Interleaving
the bits of several columns into one Morton key and range-writing by
that key gives every participating column locality inside each file —
parquet row-group min/max stats then prune scans for predicates on ANY
of the z-ordered columns (the technique Delta/Iceberg expose as
`OPTIMIZE ZORDER BY`; plain Spark has no built-in).

Everything is JVM-side bit arithmetic (`shiftleft`/`&`/`|` chains
inside whole-stage codegen) — no UDFs — and the only exchange is the
range partition the clustered write needs anyway.

Scale notes:
- `zorder_key` is a pure projection; `write_zordered` adds exactly one
  exchange (repartitionByRange's sample pass + shuffle) — the same
  cost as any sorted write.
- skewed/unbounded columns should be rank- or bucket-mapped into the
  key domain first (`bits` clamps, it does not rebalance); id-like and
  bounded numeric columns work directly.
- pruning is engine-native: the written files are ordinary parquet
  whose row-group stats are tight on every z-ordered column, so ANY
  reader (Spark, DuckDB, Trino) prunes them without knowing about
  z-order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(*cols: Column | str, bits: int = 21) -> Column:
    """Morton-interleave the low ``bits`` of each column into one
    BIGINT key.  ``bits × len(cols)`` must fit a signed 64-bit value
    (≤ 63); values are clamped into [0, 2^bits) after a floor at 0.

    Bit layout: output bit ``i*len(cols)+j`` = bit ``i`` of column
    ``j`` — adjacent key values differ in low-order bits of every
    column, which is exactly what makes per-file min/max ranges tight
    on all of them."""
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("z-order needs at least two columns")
    if bits * ncols > 63:
        raise ValueError(
            f"bits={bits} × {ncols} columns exceeds a signed 64-bit key")
    out = F.lit(0).cast("long")
    max_v = F.lit((1 << bits) - 1).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = F.least(F.greatest(col.cast("long"), F.lit(0)), max_v)
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)),
                            i * ncols + j))
    return out


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 32, bits: int = 21,
                   fmt: str = "parquet") -> None:
    """Cluster ``df`` by the Morton key of ``cols`` and write
    ``n_files`` range-partitioned, internally-sorted files.  One
    exchange total; the key column itself is not persisted."""
    keyed = df.withColumn("_zkey", zorder_key(*cols, bits=bits))
    (keyed.repartitionByRange(n_files, "_zkey")
          .sortWithinPartitions("_zkey")
          .drop("_zkey")
          .write.mode("overwrite").format(fmt).save(path))
