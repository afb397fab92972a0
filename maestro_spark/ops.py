"""Relational operator library (SURVEY §2.B/C/D/E/F/G).

Thin, composable wrappers over DataFrame primitives where Spark already has
the operator (Catalyst does the planning), plus real implementations where it
doesn't (as-of join, salted join, gap-based sessionization, per-group top-k).
Everything is JVM-side expression code — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------- joins
def broadcast_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """C1: explicit broadcast hint for known-small dimensions — at 100 TB the
    planner's size estimate can miss on post-filter dims; the hint is free."""
    return fact.join(F.broadcast(dim), on, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """C9: skew-salted equi join. The probe (left, skewed) side gets a random
    salt in [0, n_salts); the build side is exploded n_salts times, so a hot
    key spreads over n_salts tasks instead of one. Semantics identical to a
    plain equi join; AQE skew-join is the backstop, this is the explicit tool
    (north_rule: 'partitioning / shuffle / skew handled explicitly').

    The salt is derived from a high-cardinality hash of the whole left row
    (monotonically_increasing_id is partition-deterministic), never from the
    join key — so rows of one hot key really do scatter.
    """
    salt = (F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))).cast("int")
    l_s = left.withColumn("_salt", salt)
    r_s = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = l_s.join(r_s, [key, "_salt"], how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """C7: as-of join — for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` group.

    Spark has no native ASOF JOIN; the scalable pattern is union + window
    carry-forward: one shuffle on (on), no range-explosion, no driver loop.
    Equivalent to DuckDB ``ASOF JOIN`` (the oracle uses that).
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    rt = (
        right.select(on, right_ts, *right_cols)
        .withColumn("_side", F.lit(0))
        .withColumn("_ats", F.col(right_ts))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (_side asc) so a
    # right row AT the left timestamp is visible to it (<= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in right_cols]
    out_cols = [F.col(c) for c in left.columns] + carried
    return u.select(*out_cols, F.col("_side")).filter(F.col("_side") == 1).drop("_side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    conds: list[Column],
    equi: list[str] | None = None,
    broadcast_right: bool = True,
) -> DataFrame:
    """C6: theta/range join. With an equi prefix Spark plans SMJ/SHJ plus a
    post-filter; without one, a small right side must be broadcast or the
    plan degenerates to BNLJ — so broadcast is the default here."""
    r = F.broadcast(right) if broadcast_right and equi is None else right
    cond = None
    for c in ([F.col(k) == r[k] for k in equi] if equi else []) + conds:
        cond = c if cond is None else (cond & c)
    return left.join(r, cond)


# ------------------------------------------------------------- aggregations
def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """F3: global top-k — Spark turns sort+limit into TakeOrderedAndProject
    (per-partition heap + driver merge of k rows), no global sort."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, group: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """F3/E1: per-group top-k via row_number window."""
    w = Window.partitionBy(*group).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")


def sessionize(
    df: DataFrame, key: str, ts: str, gap_seconds: int, session_col: str = "session_id"
) -> DataFrame:
    """I3 (batch form): gap-based sessionization via lag + cumulative sum —
    a new session starts when the gap to the previous event exceeds
    ``gap_seconds``. One shuffle on ``key``. The streaming twin is
    ``session_window`` (maestro_spark.stream)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    new_sess = (
        F.when(prev.isNull(), F.lit(1))
        .when(
            F.col(ts).cast("timestamp").cast("long") - prev.cast("timestamp").cast("long")
            > gap_seconds,
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    return df.withColumn(
        session_col,
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def validate_split(df: DataFrame, valid: Column) -> tuple[DataFrame, DataFrame]:
    """B4 (maestro validator analogue): route rows failing checks to an error
    channel. Two lazily-filtered branches off one plan; callers persist the
    parent if both sides are consumed."""
    flagged = df.withColumn("_valid", valid)
    return (
        flagged.filter(F.col("_valid")).drop("_valid"),
        flagged.filter(~F.col("_valid")).drop("_valid"),
    )
