"""Explicit skew handling (SURVEY §2.C9/D8/K3, north_rule: 'partitioning /
shuffle / skew handled explicitly').

Three layers, outermost first:

1. **Merge-path structural spread** (always on): the per-epoch exchange keys
   are ``(pk_bucket, turn_idx)``, so a hot conversation's events fan out
   across its turns instead of pinning one task — and because ``turn_idx`` is
   part of the dedup key, correctness is untouched (the salt is *inside* the
   key, the one place salting is free). Implemented in merge.merge_batch.
2. **Heavy-hitter detection** (per epoch, cheap): approximate top keys via
   ``count_min_sketch``-style counting — here a plain groupBy count top-k,
   which at epoch sizes is one extra partial-agg pass. Feeds lineage/metrics
   and the join salting decision.
3. **Join salting** (ops.salted_join): for enrichment joins against dimension
   tables where one key is hot; AQE skew-join is the backstop
   (spark.sql.adaptive.skewJoin.enabled=true in session defaults).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, key_cols: list[str], k: int = 10, min_count: int = 2
) -> DataFrame:
    """Top-k keys by frequency (deterministic tie-break on the keys)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), *key_cols)
        .limit(k)
    )


def hot_key_counts_sketch(df: DataFrame, key_col: str, eps: float = 0.001,
                          confidence: float = 0.99, seed: int = 42):
    """Count-min sketch of a key column (SURVEY D8): sub-linear memory,
    mergeable across epochs. Returns the sketch binary (driver-side decode
    via the JVM CountMinSketch when needed)."""
    return df.agg(
        F.count_min_sketch(F.col(key_col), F.lit(eps), F.lit(confidence), F.lit(seed))
        .alias("cms")
    )


def skew_ratio(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Diagnostic: max/mean key frequency — >>1 means salting will pay."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        (F.max("n") / F.avg("n")).alias("max_over_mean"),
        F.max("n").alias("max_n"),
        F.count(F.lit(1)).alias("n_keys"),
    )
