"""Invariant tests for the part-3 corpus (reshaping / sampling / subquery).

The oracle gate (tools/check_oracles.py) already value-checks every one of
these against DuckDB; here we pin the *semantic invariants* that a hash
mismatch would not localize: sample determinism and per-stratum exactness,
pivot/unpivot round-trip mass, and the EXISTS→semi-join plan rewrite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import maestro_spark.queries2  # noqa: F401  (registers parts 2+3)
from maestro_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_stratified_sample_exact_per_stratum(spark):
    out = QUERIES["q_sample_stratified"](spark, SF)
    per = {r["event_type"]: r["n"] for r in
           out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_types = spark.read.parquet(f"{SF}/events.parquet") \
        .select("event_type").distinct().count()
    assert len(per) == n_types
    assert all(n == 40 for n in per.values()), per


def test_hash_sample_deterministic_and_unbiased(spark):
    a = set(r[0] for r in QUERIES["q_sample_hash"](spark, SF).select("event_id").collect())
    b = set(r[0] for r in QUERIES["q_sample_hash"](spark, SF).select("event_id").collect())
    assert a == b  # same rows every run — no RNG anywhere
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    frac = len(a) / total
    assert 0.08 < frac < 0.17, frac  # ~2/16 nominal


def test_pivot_mass_conservation(spark):
    """Wide counts sum back to the plain groupBy count (no rows lost or
    double-counted by the pivot)."""
    wide = QUERIES["q_pivot"](spark, SF)
    wide_total = wide.select(
        (F.col("n_open") + F.col("n_filled") + F.col("n_partial")).alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    assert wide_total == spark.read.parquet(f"{SF}/orders.parquet").count()


def test_unpivot_round_trip(spark):
    long = QUERIES["q_unpivot"](spark, SF)
    # 3 measures x n_flags rows, and re-pivoting recovers the same values
    flags = long.select("l_returnflag").distinct().count()
    assert long.count() == 3 * flags
    back = long.groupBy("l_returnflag").pivot(
        "measure", ["sum_qty", "sum_price", "sum_disc"]).sum("amount")
    merged = back.join(
        QUERIES["q_unpivot"](spark, SF).filter(F.col("measure") == "sum_qty")
        .select("l_returnflag", F.col("amount").alias("direct")),
        "l_returnflag",
    )
    assert merged.filter(F.col("sum_qty") != F.col("direct")).count() == 0


def test_exists_rewrites_to_semi_join(spark):
    plan = QUERIES["q_sql_exists"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan[:2000]


def test_scalar_subquery_matches_manual_threshold(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    qv = F.floor(F.col("value") * 1000).cast("long")
    mean = ev.agg(F.avg(qv)).collect()[0][0]
    manual = ev.filter(qv > F.lit(mean)).count()
    got = QUERIES["q_scalar_subquery"](spark, SF).agg(F.sum("n_above")).collect()[0][0]
    assert got == manual
