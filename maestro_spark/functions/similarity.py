"""Similarity search over embedding columns (task brief, first-class).

- brute-force cosine top-k: the correctness baseline — one pass over the
  corpus per query batch, dot products via zip_with/aggregate (JVM codegen,
  no Python);
- quantized integer dot-product variant: floor(x*1000) int arithmetic —
  bit-exact across engines, used for the DuckDB-oracle query;
- LSH-bucketed ANN (random signed projections): the scale path — hash each
  vector to a b-bit sign signature with seeded xxhash64-derived pseudo-random
  hyperplanes, probe only matching (or near-matching) buckets. Recall/cost
  trades off with n_bits / n_tables; candidate verification reuses the
  brute-force scorer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array<float> columns (codegen)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL instead of an ANSI-mode
    # divide-by-zero error (Spark 4 default); NULL sorts last under desc
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def quantized_dot(a: Column, b: Column, scale: int = 1000) -> Column:
    """Integer dot product of floor(x*scale) — exact (float32*scale fits a
    double exactly, floor is deterministic), so SQL oracles match bit-for-bit."""
    q = lambda x: F.floor(x.cast("double") * scale).cast("long")  # noqa: E731
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: q(x) * q(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "cosine",
) -> DataFrame:
    """Top-k nearest corpus vectors to one query vector.

    The query is inlined as a literal array (broadcast-by-construction);
    scoring happens inside the scan stage; sort+limit becomes
    TakeOrderedAndProject — per-partition heaps, k rows to the driver.
    """
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    score = {"cosine": cosine, "dot": dot}[metric](F.col(vec_col), qcol)
    return (
        corpus.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN join: for every query row the top-k corpus rows. Queries are
    broadcast (the small side by assumption); per-query top-k via window."""
    from pyspark.sql import Window

    scored = corpus.join(F.broadcast(queries)).withColumn(
        "score", cosine(F.col(vec_col), F.col(q_vec))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(q_id, id_col, "score", F.col("_rn").alias("rank"))
    )


# ------------------------------------------------------------- LSH-bucketed
def _projection_vector(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a seed (numpy, driver-side
    only — tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return [float(x) for x in v]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-projection signature: bit i = (vec . plane_i) >= 0. Returns a
    long (up to 63 planes)."""
    sig = None
    for i, p in enumerate(planes):
        pcol = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(vec, pcol) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return sig


def ann_lsh_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: prefilter corpus to LSH buckets within ``multiprobe_hamming``
    of the query's signature, then exact cosine on the candidates.

    At scale the signature is precomputed and stored as a column (bucket-
    partitioned), making the probe a partition-pruned scan; here it is
    computed on the fly.
    """
    dim = len(query_vec)
    planes = [_projection_vector(seed + i, dim) for i in range(n_bits)]
    sig = lsh_signature(F.col(vec_col), planes)
    import numpy as np

    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) >= 0:
            qsig |= 1 << i
    cand = corpus.withColumn("_sig", sig).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= multiprobe_hamming
    )
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
