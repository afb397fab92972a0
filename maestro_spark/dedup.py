"""Max-LSN dedup — the engine's hottest operator (SURVEY §2.D2/E1/K2).

Two equivalent forms are provided; the **aggregation form is the default**
because ``groupBy().agg(max_by(...))`` gets map-side partial aggregation for
free (duplicates and superseded updates collapse before the shuffle), while
the window form (`row_number`) must shuffle every event. Both are kept and
property-tested equal (SURVEY §5.2).

A delete is a *winner*, not an absence: deletes survive dedup as rows so the
merge can apply them (the classic CDC bug called out in SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from maestro_spark.schema import KEY_COLS


def dedup_max_lsn(
    events: DataFrame,
    keys: list[str] | None = None,
    lsn_col: str = "op_lsn",
    order: Column | None = None,
) -> DataFrame:
    """One winning event per key: the one with max LSN (agg form).

    ``order`` may override the ordering expression (the merge passes
    ``struct(op_lsn, _prio)`` so current table state wins LSN ties against a
    re-delivered event with identical content).
    """
    keys = keys or KEY_COLS
    rest = [c for c in events.columns if c not in keys]
    ord_expr = order if order is not None else F.col(lsn_col)
    return (
        events.groupBy(*keys)
        .agg(F.max_by(F.struct(*rest), ord_expr).alias("_w"))
        .select(*keys, "_w.*")
    )


def dedup_max_lsn_window(
    events: DataFrame, keys: list[str] | None = None, lsn_col: str = "op_lsn"
) -> DataFrame:
    """Window form (SURVEY §2.E1) — kept for equivalence testing and for
    plans that already carry a compatible partitioning."""
    keys = keys or KEY_COLS
    w = Window.partitionBy(*keys).orderBy(F.col(lsn_col).desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(*events.columns)
    )
