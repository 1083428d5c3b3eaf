"""Grouped-map operators via ``applyInPandas`` — the engine's
Reducer-equivalent extension point (SURVEY.md §2.9: the reference's
only extensibility was writing a new Reducer class;
mapred/SSTableData.scala:45,79 are the two instances).

Use ONLY where the built-in aggregate/window surface genuinely can't
express the computation (here: per-group vector standardization, which
needs two passes over the group's matrix).  Arrow-batched; one Python
worker per group partition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

NORMALIZED_SCHEMA = StructType([
    StructField("vec_id", LongType(), False),
    StructField("label", IntegerType(), False),
    StructField("normalized", ArrayType(DoubleType()), False),
])


def normalize_embeddings_per_label(emb: DataFrame) -> DataFrame:
    """Standardize each embedding against its label group's
    component-wise mean/std (z-score within cluster) — a grouped-map
    that needs the whole group in memory at once.

    Scale notes: group size is bounded by label cardinality design
    (clusters, not the corpus); groups stream through Arrow batches and
    shuffle once on label.  Deterministic: plain numpy arithmetic, no
    RNG.
    """
    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        mu = mat.mean(axis=0)
        sd = mat.std(axis=0)
        sd[sd == 0.0] = 1.0
        out = (mat - mu) / sd
        return pd.DataFrame({
            "vec_id": pdf["vec_id"].values,
            "label": pdf["label"].values,
            "normalized": [row.tolist() for row in out],
        })

    return (emb.select("vec_id", "label", "embedding")
               .groupBy("label")
               .applyInPandas(norm, schema=NORMALIZED_SCHEMA))
