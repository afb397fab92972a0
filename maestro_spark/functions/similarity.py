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
    metric: str = "cosine",
) -> DataFrame:
    """k-NN join: for every query row the top-k corpus rows. Queries are
    broadcast (the small side by assumption); per-query top-k via window.
    ``metric="qdot"`` scores with the quantized integer dot product —
    bit-exact across engines, hence oracle-checkable."""
    from pyspark.sql import Window

    score_fn = {"cosine": cosine, "dot": dot, "qdot": quantized_dot}[metric]
    scored = corpus.join(F.broadcast(queries)).withColumn(
        "score", score_fn(F.col(vec_col), F.col(q_vec))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(q_id, id_col, "score", F.col("_rn").alias("rank"))
    )


def _quantized(vec_col: str, scale: int) -> Column:
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold_centi: int = 40,
    scale: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "exact",
    n_bits: int = 12,
    prefix_bits: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (task-brief dedup family): all
    (id_a < id_b) pairs whose cosine similarity is >= threshold_centi/100.

    The comparison is exact integer arithmetic on floor(x*scale) quantized
    vectors — ``qdot > 0 AND qdot^2 * 100^2 >= t^2 * |a|^2 * |b|^2`` — so the
    decision is bit-identical across engines (DuckDB-oracle-checkable), with
    no float sqrt/divide in the predicate.

    ``mode="exact"`` — all-pairs verification baseline: quadratic, scoped to
    candidate verification / small corpora exactly like
    ``dedup_text.jaccard_pairs``. ``mode="lsh"`` — the 100 TB shape: pairs
    are generated only within matching sign-projection signature prefixes
    (same hyperplane family as :func:`ann_lsh_topk`), then verified with the
    identical exact predicate; recall trades off with ``prefix_bits`` and is
    asserted against planted near-dups in tests rather than an oracle.
    """
    t2 = threshold_centi * threshold_centi
    base = (
        corpus.select(F.col(id_col), _quantized(vec_col, scale).alias("_q"))
        .withColumn(
            "_n2",
            F.aggregate(
                F.transform("_q", lambda v: v * v),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
    )
    if mode == "lsh":
        sample = corpus.select(vec_col).head()
        planes = [_projection_vector(seed + i, len(sample[0])) for i in range(n_bits)]
        sig = lsh_signature(F.col(vec_col), planes)
        base = (
            corpus.select(
                F.col(id_col),
                F.shiftrightunsigned(sig, n_bits - prefix_bits).alias("_b"),
            )
            .join(base, id_col)
        )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if mode == "lsh":
        pairs = a.join(b, (F.col("a._b") == F.col("b._b")) & cond)
    else:
        pairs = a.join(b, cond)
    qdot = F.aggregate(
        F.zip_with(F.col("a._q"), F.col("b._q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            qdot.alias("qdot"),
            F.col("a._n2").alias("_na2"),
            F.col("b._n2").alias("_nb2"),
        )
        .filter(
            (F.col("qdot") > 0)
            & (
                F.col("qdot") * F.col("qdot") * F.lit(scale * scale)
                >= F.lit(t2) * F.col("_na2") * F.col("_nb2")
            )
        )
        .select("id_a", "id_b", "qdot")
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

    Computes signatures on the fly (one full corpus pass per query set); the
    persisted form — :func:`build_lsh_index` + :func:`ann_lsh_topk_indexed`
    — materializes them once into a bucket-partitioned layout so each probe
    is a partition-pruned scan.
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


# ---------------------------------------------------------- persisted index
def _query_signature(query_vec: list[float], planes: list[list[float]]) -> int:
    import numpy as np

    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) >= 0:
            qsig |= 1 << i
    return qsig


def build_lsh_index(
    corpus: DataFrame,
    index_dir: str,
    n_bits: int = 12,
    seed: int = 42,
    prefix_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Materialize the LSH signature index: one corpus pass computes every
    vector's ``n_bits`` sign-projection signature, written as parquet
    partitioned by the signature's top ``prefix_bits`` (hive-style
    ``_bucket=<p>/`` dirs, 2^prefix_bits of them). A probe then touches only
    the bucket dirs within its multiprobe Hamming radius — Catalyst partition
    pruning on the ``_bucket`` filter, no manifest code needed — instead of
    re-hashing the corpus per query. Index parameters are recorded in
    ``_lsh_meta.json`` so probes reconstruct the identical hyperplanes.

    Incremental maintenance at scale: signatures are a pure function of the
    vector, so new corpus rows append into their bucket dirs; no global
    rebuild (the same reason the CDC lake buckets by key hash).
    """
    import json
    import os

    sample = corpus.select(vec_col).head()
    dim = len(sample[0])
    planes = [_projection_vector(seed + i, dim) for i in range(n_bits)]
    sig = lsh_signature(F.col(vec_col), planes)
    (
        corpus.withColumn("_sig", sig)
        .withColumn(
            "_bucket", F.shiftrightunsigned(F.col("_sig"), n_bits - prefix_bits)
        )
        .repartition("_bucket")
        .write.partitionBy("_bucket")
        .mode("overwrite")
        .parquet(index_dir)
    )
    meta = {
        "n_bits": n_bits, "seed": seed, "prefix_bits": prefix_bits,
        "dim": dim, "vec_col": vec_col, "id_col": id_col,
    }
    with open(os.path.join(index_dir, "_lsh_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def update_lsh_index(corpus_delta: DataFrame, index_dir: str) -> dict:
    """Delta-maintain a persisted LSH index (r2 verdict #5): signatures are
    a pure function of vector + the seeded hyperplanes recorded in the
    index meta, so new corpus rows APPEND into their bucket dirs — work is
    O(delta), never a rebuild, and the hive partitioning (hence probe
    partition pruning) is untouched. A maintained index is bit-identical to
    a fresh rebuild over the union corpus (oblivious hashing; asserted by
    tests)."""
    import json
    import os

    with open(os.path.join(index_dir, "_lsh_meta.json")) as fh:
        meta = json.load(fh)
    planes = [
        _projection_vector(meta["seed"] + i, meta["dim"])
        for i in range(meta["n_bits"])
    ]
    sig = lsh_signature(F.col(meta["vec_col"]), planes)
    (
        corpus_delta.withColumn("_sig", sig)
        .withColumn(
            "_bucket",
            F.shiftrightunsigned(F.col("_sig"), meta["n_bits"] - meta["prefix_bits"]),
        )
        .repartition("_bucket")
        .write.partitionBy("_bucket")
        .mode("append")
        .parquet(index_dir)
    )
    return meta


def update_ivf_index(corpus_delta: DataFrame, index_dir: str) -> dict:
    """Delta-maintain a persisted IVF index: assign new rows to the NEAREST
    EXISTING centroid (from the index meta) and append into its list dir —
    the standard IVF maintenance story (lists drift as data drifts; re-fit
    centroids only when probe recall degrades). A maintained index equals a
    fresh rebuild that pins the same centroids (asserted by tests)."""
    import json
    import os

    with open(os.path.join(index_dir, "_ivf_meta.json")) as fh:
        meta = json.load(fh)
    (
        corpus_delta.withColumn(
            "_list", _assign_expr(meta["centroids"], meta["vec_col"])
        )
        .repartition("_list")
        .write.partitionBy("_list")
        .mode("append")
        .parquet(index_dir)
    )
    return meta


def probe_buckets(qsig: int, n_bits: int, prefix_bits: int, hamming: int) -> list[int]:
    """Bucket prefixes a probe must visit: every prefix within ``hamming`` of
    the query's prefix (the remaining low bits can absorb the rest of the
    budget). sum_{i<=h} C(prefix_bits, i) buckets of 2^prefix_bits."""
    from itertools import combinations

    qprefix = qsig >> (n_bits - prefix_bits)
    out = set()
    for d in range(min(hamming, prefix_bits) + 1):
        for flip in combinations(range(prefix_bits), d):
            p = qprefix
            for b in flip:
                p ^= 1 << b
            out.add(p)
    return sorted(out)


def ann_lsh_topk_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Probe the persisted index: partition-pruned scan of the candidate
    bucket dirs, full-signature Hamming refine, exact cosine re-rank.
    Identical results to :func:`ann_lsh_topk` at the same parameters —
    asserted by tests — while reading only matching buckets."""
    import json
    import os

    with open(os.path.join(index_dir, "_lsh_meta.json")) as fh:
        meta = json.load(fh)
    planes = [_projection_vector(meta["seed"] + i, meta["dim"]) for i in range(meta["n_bits"])]
    qsig = _query_signature(query_vec, planes)
    buckets = probe_buckets(qsig, meta["n_bits"], meta["prefix_bits"], multiprobe_hamming)
    cand = (
        spark.read.parquet(index_dir)
        .filter(F.col("_bucket").isin(buckets))  # -> PartitionFilters, dir-pruned
        .filter(F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= multiprobe_hamming)
    )
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(
            F.col(meta["id_col"]), cosine(F.col(meta["vec_col"]), qcol).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(meta["id_col"]))
        .limit(k)
    )


# --------------------------------------------------------------------- IVF
# The second scale path the task brief names ("an IVF or LSH-bucketed
# variant"): k-means coarse quantization. Where LSH buckets are oblivious
# (random hyperplanes), IVF lists adapt to the data's actual density — at
# equal probe cost IVF usually buys more recall on clustered embeddings,
# which real text/embedding corpora are.


def kmeans_fit(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over an array<float> column, expressed
    as DataFrame aggregations (no MLlib, no Python in the hot path).

    Per iteration ONE shuffle: the assignment is a pure per-row codegen
    expression (distance to every centroid via a literal array-of-arrays,
    argmin via array_position), and the centroid update is
    posexplode → groupBy (cluster, dim) avg — k×dim rows to the driver,
    independent of corpus size, so the loop scales to any corpus that one
    groupBy scales to. Init picks the k rows with the smallest seeded
    xxhash64(id) — deterministic across runs and cluster sizes (no
    Date.now/random), which the replay-equality story requires.
    """
    dim = len(corpus.select(vec_col).head()[0])
    init = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(k)
        .collect()
    )
    cents = [list(map(float, r[1])) for r in init]
    for _ in range(iters):
        assign = _assign_expr(cents, vec_col)
        rows = (
            corpus.select(assign.alias("_c"), F.posexplode(F.col(vec_col)).alias("_d", "_v"))
            .groupBy("_c", "_d")
            .agg(F.avg(F.col("_v").cast("double")).alias("_m"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty cluster keeps its centroid
        got: dict[int, list[float]] = {}
        for r in rows:
            got.setdefault(r["_c"], [0.0] * dim)[r["_d"]] = r["_m"]
        for c, vec in got.items():
            new[c] = vec
        cents = new
    return cents


def _assign_expr(cents: list[list[float]], vec_col: str) -> Column:
    """0-based index of the nearest centroid (squared L2), pure codegen."""
    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in cents])
    dists = F.transform(
        carr,
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col), c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    k: int = 16,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> dict:
    """Materialize the IVF index: fit k centroids, assign every vector to
    its nearest list, write parquet partitioned by ``_list=<c>`` (hive
    dirs, Catalyst partition pruning — same layout contract as the LSH
    index). Centroids land in ``_ivf_meta.json`` so probes rank lists
    driver-side with no corpus access. New rows append into their list
    (assignment is a pure function of vector + centroids); re-fit only when
    drift degrades recall — the standard IVF maintenance story."""
    import json
    import os

    cents = centroids if centroids is not None else kmeans_fit(
        corpus, k=k, iters=iters, seed=seed, vec_col=vec_col, id_col=id_col
    )
    (
        corpus.withColumn("_list", _assign_expr(cents, vec_col))
        .repartition("_list")
        .write.partitionBy("_list")
        .mode("overwrite")
        .parquet(index_dir)
    )
    meta = {"centroids": cents, "vec_col": vec_col, "id_col": id_col, "k": k}
    with open(os.path.join(index_dir, "_ivf_meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def ann_ivf_topk_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Probe the IVF index: rank lists by centroid distance DRIVER-side
    (k×dim floats from meta, no data IO), partition-pruned scan of the
    ``nprobe`` nearest lists, exact cosine re-rank inside. ``nprobe=len(
    centroids)`` degenerates to exact brute force — the recall dial."""
    import json
    import os

    with open(os.path.join(index_dir, "_ivf_meta.json")) as fh:
        meta = json.load(fh)
    scored = sorted(
        range(len(meta["centroids"])),
        key=lambda c: sum(
            (q - x) * (q - x) for q, x in zip(query_vec, meta["centroids"][c])
        ),
    )
    lists = scored[: max(1, nprobe)]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        spark.read.parquet(index_dir)
        .filter(F.col("_list").isin(lists))  # -> PartitionFilters, dir-pruned
        .select(
            F.col(meta["id_col"]), cosine(F.col(meta["vec_col"]), qcol).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(meta["id_col"]))
        .limit(k)
    )
