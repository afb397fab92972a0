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


# --------------------------------------------------------- z-order clustering
def zorder_key(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]] | None = None,
    bits: int | None = None,
) -> Column:
    """Morton (z-order) key over 2-4 numeric/timestamp columns — pure
    codegen (shift/and/or), no UDFs, no shuffle.

    Each column is min-max scaled to ``bits`` integer levels and the
    level bits are interleaved, so sorting by the key clusters rows that
    are close in EVERY dimension; per-file zone maps then hold tight
    ranges on all of them simultaneously (the Delta OSS ZORDER BY
    rationale — one clustered rewrite serves range predicates on several
    columns instead of one).

    ``bounds`` maps column → (lo, hi) in the column's numeric domain
    (timestamps: epoch micros — the zone-map store's own representation,
    so compact() can pass stats driver-side with zero data IO). Columns
    missing from ``bounds`` get theirs computed with one tiny agg job.
    Linear scaling is skew-sensitive (Delta uses sampled range ids
    instead); for event-time/turn-index style dimensions it is accurate
    and deterministic, which the engine prefers.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key wants 2-4 columns")
    if bits is None:
        # default: the finest resolution that fits a signed long — 16 bits
        # for 2-3 columns, 15 for 4 (a fixed 16 would make 4 columns raise,
        # and compact()/the CLI never pass bits explicitly)
        bits = min(16, 63 // len(cols))
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    types = dict(df.dtypes)
    for c in cols:
        if c not in types:
            raise ValueError(f"unknown column {c!r}")
        if types[c].startswith("string"):
            raise ValueError(
                f"zorder_key needs numeric/timestamp columns; {c!r} is a string "
                "(string point reads are served by key blooms instead)"
            )

    def numeric(c: str) -> Column:
        if types[c] == "timestamp_ntz":
            # tz-free wall-clock micros — the exact convention of the
            # zone-map store (filestats._micros on naive footer stats)
            return F.expr(
                "timestampdiff(MICROSECOND, "
                f"timestamp_ntz'1970-01-01 00:00:00', `{c}`)"
            ).cast("double")
        if types[c].startswith("timestamp"):
            return F.unix_micros(F.col(c)).cast("double")
        return F.col(c).cast("double")

    bounds = dict(bounds or {})
    missing = [c for c in cols if c not in bounds]
    if missing:
        row = df.agg(
            *[
                f
                for c in missing
                for f in (
                    F.min(numeric(c)).alias(f"__lo_{c}"),
                    F.max(numeric(c)).alias(f"__hi_{c}"),
                )
            ]
        ).head()
        for c in missing:
            bounds[c] = (row[f"__lo_{c}"], row[f"__hi_{c}"])

    levels = (1 << bits) - 1
    n = len(cols)
    z: Column | None = None
    for j, c in enumerate(cols):
        lo, hi = bounds[c]
        if lo is None or hi is None or float(hi) <= float(lo):
            continue  # constant / unbounded column contributes nothing
        scaled = (numeric(c) - F.lit(float(lo))) / F.lit(float(hi) - float(lo))
        lvl = F.least(
            F.greatest(F.floor(scaled * levels), F.lit(0)), F.lit(levels)
        ).cast("long")
        # interleave: bit i of column j lands at position i*n + j
        for i in range(bits):
            piece = F.shiftleft(
                F.shiftright(lvl, i).bitwiseAND(F.lit(1)), i * n + j
            )
            z = piece if z is None else z.bitwiseOR(piece)
    return F.coalesce(z, F.lit(0)).cast("long") if z is not None else F.lit(0).cast("long")
