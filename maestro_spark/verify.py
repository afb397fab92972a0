"""Replay-equality verification (SURVEY §2.G2/G3/K9, BASELINE.json:15).

The binding invariant: per-turn ``text`` equality under stable
``(conv_id, turn_idx)`` ordering, plus an empty symmetric difference between
two table states (``exceptAll`` both ways — duplicate-sensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetric_diff_empty(a: DataFrame, b: DataFrame, cols: list[str] | None = None) -> bool:
    """K9: exceptAll in both directions is empty (duplicate-sensitive)."""
    if cols:
        a, b = a.select(*cols), b.select(*cols)
    else:
        b = b.select(*a.columns)
    return a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def per_turn_text_equal(state: DataFrame, expected: DataFrame) -> bool:
    """The north-star invariant: keys identical, text identical per key."""
    s = state.select("conv_id", "turn_idx", "text", F.lit(True).alias("_in_s"))
    e = expected.select(
        "conv_id", "turn_idx", F.col("text").alias("_etext"), F.lit(True).alias("_in_e")
    )
    joined = s.join(e, ["conv_id", "turn_idx"], "full_outer")
    bad = joined.filter(
        F.col("_in_s").isNull()  # key only in expected
        | F.col("_in_e").isNull()  # key only in state
        | ~F.col("text").eqNullSafe(F.col("_etext"))
    )
    return bad.isEmpty()


def canonical(state: DataFrame) -> DataFrame:
    """Stable global ordering for equality snapshots / golden files (F1)."""
    return state.orderBy("conv_id", "turn_idx")
