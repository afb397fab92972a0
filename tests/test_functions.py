"""Tests for training-data functions: text stats, dedup, similarity,
multimodal plumbing, vectorized-UDF guard."""

from __future__ import annotations

import glob

import numpy as np
from pyspark.sql import functions as F

from maestro_spark.functions import dedup_text, multimodal, similarity
from maestro_spark.functions import text as tx


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quick", "quickk")),  # near dup of 0
        (3, "der hund und die katze laufen durch der wald und der park heute"),
        (4, "completely different text about spark and data engineering at scale"),
        (5, "  the   quick brown fox jumps over the lazy dog and runs far away today "),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark):
    d = _docs(spark)
    groups = dedup_text.exact_dup_groups(d).collect()
    # 0, 1 and 5 normalize to the same fingerprint
    assert len(groups) == 1 and groups[0].n_dups == 3 and groups[0].keep_id == 0
    kept = dedup_text.dedup_exact(d)
    assert kept.count() == 4
    assert sorted(r.doc_id for r in kept.collect()) == [0, 2, 3, 4]


def test_jaccard_and_minhash_find_near_dups(spark):
    d = _docs(spark).filter(F.col("doc_id").isin(0, 2, 3, 4))
    jp = dedup_text.jaccard_pairs(d, threshold_num=1, threshold_den=2, n=3, max_chars=100)
    pairs = {(r.id_a, r.id_b) for r in jp.collect()}
    assert (0, 2) in pairs  # near dup found
    assert (0, 4) not in pairs and (3, 4) not in pairs
    mh = dedup_text.minhash_lsh_pairs(d, k=32, bands=16, n=3, max_chars=100)
    mh_pairs = {(r.id_a, r.id_b): r.est_jaccard for r in mh.collect()}
    assert (0, 2) in mh_pairs and mh_pairs[(0, 2)] > 0.5


def test_jaccard_doc_freq_cap_bounds_ubiquitous_shingle(spark):
    # 30 docs that share exactly one ubiquitous 3-gram ('zzz') but are
    # otherwise unique: uncapped, threshold 0 surfaces all C(30,2)=435
    # candidate pairs via that single shingle; the structural df-cap drops it
    # before the self-join and no pair survives
    # doc-unique char adjacent to the shared part so even boundary shingles
    # are unique to one doc; the only cross-doc shingle is 'zzz' (df=30)
    rows = [(i, "zzz" + chr(0x4E00 + i) * 8) for i in range(30)]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = dedup_text.jaccard_pairs(
        d, threshold_num=0, threshold_den=1, n=3, max_chars=100, max_doc_freq=None
    )
    assert uncapped.count() == 435
    capped = dedup_text.jaccard_pairs(
        d, threshold_num=0, threshold_den=1, n=3, max_chars=100, max_doc_freq=10
    )
    assert capped.count() == 0


def test_simhash_near_pairs(spark):
    d = _docs(spark).filter(F.col("doc_id").isin(0, 2, 4))
    s = {r.id: r.simhash for r in dedup_text.simhash(d).collect()}
    mask = (1 << 64) - 1
    ham02 = bin((s[0] ^ s[2]) & mask).count("1")
    ham04 = bin((s[0] ^ s[4]) & mask).count("1")
    assert ham02 < ham04  # near dup closer in hamming space
    # banded blocking has full recall for hamming < bands (pigeonhole):
    # every pair within the threshold must surface, incl. identical docs
    full = _docs(spark)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup_text.simhash_near_pairs(full, max_hamming=3, bands=4).collect()
    }
    sall = {r.id: r.simhash for r in dedup_text.simhash(full).collect()}
    expected = {
        (a, b)
        for a in sall
        for b in sall
        if a < b and bin((sall[a] ^ sall[b]) & mask).count("1") <= 3
    }
    assert set(pairs) == expected and expected  # exact, and non-empty


def test_lang_and_quality_features(spark):
    d = _docs(spark)
    out = {r.doc_id: r.guess for r in d.select(
        "doc_id", tx.lang_guess(F.col("text")).alias("guess")).collect()}
    assert out[0] == "en" and out[3] == "de"
    q = multimodal  # noqa: F841  (keep import used)
    feats = tx.quality_features(d).filter(F.col("doc_id") == 0).head()
    assert feats.n_tokens == 14 and feats.n_chars_m == len(_docs(spark).head().text)


def test_similarity_bruteforce_and_lsh(spark):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    vecs[7] = vecs[3] * 0.9 + 0.01  # plant a near neighbor of row 3
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qv = [float(x) for x in vecs[3]]
    bf = similarity.brute_force_topk(df.filter(F.col("vec_id") != 3), qv, k=1)
    assert bf.head().vec_id == 7
    ann = similarity.ann_lsh_topk(
        df.filter(F.col("vec_id") != 3), qv, k=1, n_bits=8, multiprobe_hamming=2
    )
    assert ann.head().vec_id == 7  # LSH recalls the planted neighbor


def test_persisted_lsh_index_prunes_and_matches(spark, tmp_path):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    vecs[7] = vecs[3] * 0.9 + 0.01
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    corpus = df.filter(F.col("vec_id") != 3)
    qv = [float(x) for x in vecs[3]]

    idx = str(tmp_path / "lsh_index")
    similarity.build_lsh_index(corpus, idx, n_bits=10, prefix_bits=6, seed=7)
    probe = similarity.ann_lsh_topk_indexed(spark, idx, qv, k=5, multiprobe_hamming=2)
    fly = similarity.ann_lsh_topk(
        corpus, qv, k=5, n_bits=10, seed=7, multiprobe_hamming=2
    )
    assert [r.vec_id for r in probe.collect()] == [r.vec_id for r in fly.collect()]
    assert probe.head().vec_id == 7  # planted neighbor recalled from the index

    # the probe is partition-pruned: it may touch only the buckets within the
    # multiprobe radius — a strict subset of the on-disk bucket dirs — and
    # the scan plan carries the _bucket partition filter
    import os

    n_dirs = sum(1 for d in os.listdir(idx) if d.startswith("_bucket="))
    planes = [similarity._projection_vector(7 + i, 16) for i in range(10)]
    qsig = similarity._query_signature(qv, planes)
    want = similarity.probe_buckets(qsig, 10, 6, 2)
    assert len(want) < n_dirs
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    assert "PartitionFilters" in buf.getvalue() and "_bucket" in buf.getvalue()


def test_embedding_neardup_pairs(spark):
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[11] = vecs[2] + rng.standard_normal(16).astype(np.float32) * 0.05
    vecs[45] = vecs[30] * 1.1  # scaled copy: cosine ~1 regardless of norm
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    exact = similarity.embedding_neardup_pairs(df, threshold_centi=90)
    got = {(r.id_a, r.id_b) for r in exact.collect()}
    assert {(2, 11), (30, 45)} <= got
    assert len(got) < 10  # random pairs stay below a 0.9 cosine bar

    # LSH blocking: a subset of the exact pairs (identical verify predicate),
    # and it still recalls the planted near-dups
    lsh = similarity.embedding_neardup_pairs(
        df, threshold_centi=90, mode="lsh", n_bits=8, prefix_bits=4
    )
    got_lsh = {(r.id_a, r.id_b) for r in lsh.collect()}
    assert got_lsh <= got
    assert {(2, 11), (30, 45)} <= got_lsh


def test_knn_join(spark):
    rows = [(i, [float(i), 0.0]) for i in range(10)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame([(100, [5.0, 0.0])], ["q_id", "q_vec"])
    out = similarity.knn_join_bruteforce(queries, corpus, k=3)
    got = sorted(r.vec_id for r in out.collect())
    assert len(got) == 3 and all(r > 0 for r in got)  # cosine of (0,0) vec is NaN-ish


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=12)
    feats = multimodal.extract_image_features(media, strict=False).collect()
    assert len(feats) == 4  # 12 rows, kind image every 3rd
    assert all(len(r.feature) == 8 for r in feats)
    plan = multimodal.frame_sample_plan(media, every_ms=250)
    assert plan.count() == 4 * 5  # 4 videos x (0,250,500,750,1000)
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|codec"):
        multimodal.extract_image_features(media, strict=True).collect()


def test_no_rowwise_python_udfs():
    """BASELINE.json:15 rule: no row-wise Python UDFs in the engine source."""
    from maestro_spark.udf import assert_vectorized_only

    files = glob.glob("/root/repo/maestro_spark/**/*.py", recursive=True)
    assert files, "engine sources not found"
    offenders = assert_vectorized_only(files)
    assert offenders == [], offenders


def test_dedup_groups_chain_and_canonical(spark):
    """A long chain A-B-C-...-Z must collapse to ONE group (the pointer-jump
    path — naive propagation needs O(chain) rounds, this must converge well
    inside max_iter), plus two disjoint small groups; canonical_docs keeps
    exactly one representative per group."""
    from maestro_spark.functions.dedup_text import canonical_docs, dedup_groups

    chain = [(i, i + 1) for i in range(100, 140)]          # 41-node chain
    pairs = chain + [(1, 2), (2, 3), (7, 8)]               # {1,2,3} and {7,8}
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    g = dedup_groups(pdf, max_iter=10).toPandas()
    by_id = dict(zip(g.id, g.group_id))
    assert all(by_id[i] == 100 for i in range(100, 141))
    assert by_id[1] == by_id[2] == by_id[3] == 1
    assert by_id[7] == by_id[8] == 7
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 7, 8, 50]], ["doc_id", "text"]
    )
    c = canonical_docs(docs, pdf).toPandas()
    keep = set(c[c.is_canonical].doc_id)
    assert keep == {1, 7, 50}  # 50 is pairless: its own group


def test_curate_documents_pipeline(spark):
    """Planted corpus: a too-short doc is gated out, an exact duplicate
    collapses to the min id, a near-dup pair keeps only its canonical, and
    a distinct doc survives untouched."""
    from maestro_spark.functions.curate import curate_documents

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base[:-12] + "yet once more"  # high shingle overlap with base
    rows = [
        (1, base),
        (2, base),                        # exact dup of 1 -> dropped
        (3, near),                        # near-dup of 1 -> non-canonical
        (4, "completely different text about spark engines and parquet files and shuffles"),
        (5, "too short"),                 # quality-gated (< 5 tokens)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = curate_documents(docs).select("doc_id").toPandas()
    assert sorted(out.doc_id) == [1, 4]


def test_dedup_groups_random_graphs_match_union_find(spark):
    """Property check on seeded random graphs: the distributed min-label
    components must equal a serial union-find on every topology (stars,
    chains, cliques, isolates all arise at these densities)."""
    import random

    from maestro_spark.functions.dedup_text import dedup_groups

    for seed, n_nodes, n_edges in [(0, 40, 25), (1, 60, 80), (2, 30, 5)]:
        rng = random.Random(seed)
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n_nodes), rng.randrange(n_nodes))))
                for _ in range(n_edges)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in range(n_nodes) if any(x in e for e in edges)}

        got = dedup_groups(
            spark.createDataFrame(edges, ["id_a", "id_b"])
        ).toPandas()
        assert dict(zip(got.id, got.group_id)) == expected, f"seed={seed}"


def test_pii_redaction_masks_every_family(spark):
    from maestro_spark.functions.pii import redact_pii

    rows = [
        (0, "mail me at jane.doe+x@sub.example.org today"),
        (1, "call 415-555-0042 or 415.555.0042"),
        (2, "ssn is 123-45-6789 ok"),
        (3, "server at 192.168.0.17 responded"),
        (4, "card 4111 1111 1111 1111 and 4111-1111-1111-1111"),
        (5, "nothing sensitive here, version 1.2 build 345"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"]).select(
        "i", redact_pii(F.col("t")).alias("r")
    )
    got = {r["i"]: r["r"] for r in df.collect()}
    assert got[0] == "mail me at <EMAIL> today"
    assert got[1] == "call <PHONE> or <PHONE>"
    assert got[2] == "ssn is <SSN> ok"
    assert got[3] == "server at <IP> responded"
    assert got[4] == "card <CARD> and <CARD>"
    # no digits leak from any masked row; benign digit runs are untouched
    assert got[5] == rows[5][1]
    for i in range(5):
        assert not any(c.isdigit() for c in got[i]), got[i]


def test_seq_pack_invariants(spark):
    """Packing must tile each shard's token stream exactly: offsets are
    contiguous, every pack except a shard's last spans the full budget."""
    from maestro_spark.queries3 import q_seq_pack

    pdf = (
        q_seq_pack(spark, "/root/testdata/sf0.001")
        .orderBy("source", "doc_id")
        .toPandas()
    )
    B = 512
    for src, g in pdf.groupby("source"):
        start = (g.pack_id * B + g.pack_offset).to_numpy()
        assert start[0] == 0
        assert (start[1:] == start[:-1] + g.n_tok.to_numpy()[:-1]).all(), src
        straddle = (g.pack_offset + g.n_tok > B).to_numpy()
        assert (g.straddles.to_numpy() == straddle.astype("int64")).all()


def test_contamination_flags_planted_overlap(spark):
    from maestro_spark.functions.dedup_text import contamination_scores

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # verbatim
            (2, "a quick brown fox appears"),                    # partial
            (3, "xyzzy plugh grue filfre quux zzyzx"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_hit"], r["n_sh"], r["contaminated"])
        for r in contamination_scores(corpus, bench).collect()
    }
    assert got[1][0] == got[1][1] and got[1][2] == 1   # 100% overlap
    assert 0 < got[2][0] < got[2][1]                   # partial overlap
    assert got[3][0] == 0 and got[3][2] == 0


def test_kmeans_recovers_planted_clusters(spark):
    """Three well-separated blobs: deterministic k-means puts each blob's
    points in one cluster (and two fits give identical centroids)."""
    rng = np.random.default_rng(3)
    centers = np.array([[10.0] * 8, [-10.0] * 8, [10.0] * 4 + [-10.0] * 4])
    vecs = np.vstack([c + 0.1 * rng.standard_normal((20, 8)) for c in centers])
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    c1 = similarity.kmeans_fit(df, k=3, iters=6, seed=5)
    c2 = similarity.kmeans_fit(df, k=3, iters=6, seed=5)
    assert c1 == c2  # bit-deterministic
    assign = df.select(
        "vec_id", similarity._assign_expr(c1, "embedding").alias("c")
    ).collect()
    by_blob = {}
    for r in assign:
        by_blob.setdefault(r["vec_id"] // 20, set()).add(r["c"])
    # each blob maps to exactly one cluster, and the three differ
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set.union(*by_blob.values())) == 3


def test_ivf_index_prunes_and_recalls(spark, tmp_path):
    """nprobe=all lists == exact brute force; nprobe=1 on clustered data
    still recalls the planted neighbor while scanning only its list."""
    rng = np.random.default_rng(4)
    centers = np.array([[8.0] * 16, [-8.0] * 16, [8.0] * 8 + [-8.0] * 8, [0.0] * 16])
    vecs = np.vstack(
        [c + 0.2 * rng.standard_normal((50, 16)) for c in centers]
    ).astype(np.float32)
    vecs[7] = vecs[3] * 0.9 + 0.01
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    corpus = df.filter(F.col("vec_id") != 3)
    qv = [float(x) for x in vecs[3]]

    idx = str(tmp_path / "ivf_index")
    meta = similarity.build_ivf_index(corpus, idx, k=4, iters=5, seed=9)
    # exactness: probing every list must equal brute force
    allp = similarity.ann_ivf_topk_indexed(spark, idx, qv, k=5, nprobe=4)
    bf = similarity.brute_force_topk(corpus, qv, k=5)
    assert [r.vec_id for r in allp.collect()] == [r.vec_id for r in bf.collect()]
    # recall at nprobe=1: the planted neighbor lives in the query's own list
    one = similarity.ann_ivf_topk_indexed(spark, idx, qv, k=1, nprobe=1)
    assert one.head().vec_id == 7
    # and the probe is partition-pruned to fewer dirs than exist on disk
    import contextlib
    import io
    import os

    n_dirs = sum(1 for d in os.listdir(idx) if d.startswith("_list="))
    assert n_dirs >= 3  # the blobs actually spread over lists
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    assert "PartitionFilters" in buf.getvalue() and "_list" in buf.getvalue()


def test_rep_ngram_fraction_flags_boilerplate(spark):
    """A highly repetitive doc scores near 10000 bp; a unique-text doc
    scores 0; short docs (< n tokens) drop out."""
    from maestro_spark.functions.text import rep_ngram_fraction

    df = spark.createDataFrame(
        [
            (1, "buy now " * 50),                 # one trigram repeated
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["rep_bp"] for r in rep_ngram_fraction(df, n=3).collect()}
    assert got[2] == 0
    assert got[1] > 9000  # ~98/100 trigrams are repeats
    assert 3 not in got


def test_simhash_index_equals_on_the_fly(spark, tmp_path):
    """The persisted banded simhash index must return EXACTLY the pairs the
    on-the-fly path returns (same bands/threshold), and appended docs fold
    into their band dirs without a rebuild."""
    full = _docs(spark)
    idx = str(tmp_path / "sh_idx")
    dedup_text.build_simhash_index(full, idx, bands=4)
    fresh = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup_text.simhash_near_pairs(full, max_hamming=3, bands=4).collect()
    }
    stored = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup_text.simhash_near_pairs_indexed(spark, idx, max_hamming=3).collect()
    }
    assert stored == fresh and fresh
    # band partitioning is on disk (hive dirs -> partition-pruned probes)
    import os

    assert sorted(
        e for e in os.listdir(idx) if e.startswith("band=")
    ) == [f"band={b}" for b in range(4)]


def test_minhash_index_equals_on_the_fly(spark, tmp_path):
    full = _docs(spark)
    idx = str(tmp_path / "mh_idx")
    dedup_text.build_minhash_index(full, idx, k=16, bands=4)
    fresh = {
        (r.id_a, r.id_b): round(r.est_jaccard, 9)
        for r in dedup_text.minhash_lsh_pairs(full, k=16, bands=4).collect()
    }
    stored = {
        (r.id_a, r.id_b): round(r.est_jaccard, 9)
        for r in dedup_text.minhash_lsh_pairs_indexed(spark, idx).collect()
    }
    assert stored == fresh and fresh


# ----------------------------------------------- exact substring dedup
def _hexpad(tag: str, n: int) -> str:
    """Deterministic unique filler with no accidental 40-char repeats."""
    import hashlib

    out = ""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{tag}:{i}".encode()).hexdigest()
        i += 1
    return out[:n]


def test_substring_dup_planted_and_guarantee(spark):
    """A 60-char passage shared by two docs must flag BOTH with exactly
    60-40+1=21 duplicated windows each (stride 1 counts every covering
    window; boundary chars differ on both sides so no extra window can
    straddle); an all-unique doc stays at zero; a doc shorter than the
    window length is omitted. This is the Lee-et-al exactness guarantee:
    stride=1 catches every duplicated substring >= length."""
    shared = _hexpad("shared", 60)
    rows = [
        (1, "A" + shared + "B" + _hexpad("t1", 40)),
        (2, "C" + shared + "D" + _hexpad("t2", 40)),
        (3, _hexpad("solo", 100)),
        (4, "short doc"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in dedup_text.duplicated_window_stats(
            d, length=40, stride=1, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # doc 4 has no 40-char window
    assert out[1].dup_windows == 21 and out[2].dup_windows == 21
    assert out[3].dup_windows == 0 and out[3].dup_ratio_bp == 0
    for i in (1, 2):
        assert out[i].total_windows == len(rows[i - 1][1]) - 40 + 1
        assert out[i].dup_ratio_bp == out[i].dup_windows * 10000 // out[i].total_windows


def test_substring_dup_hashed_equals_exact_and_min_docs(spark):
    """mode='hashed' (the 100 TB shuffle shape) must produce identical
    output to the exact-bytes mode, and min_docs=3 must drop a passage
    shared by only two docs while keeping one shared by three. Passages
    and fillers are hash-generated so the ONLY >=40-char repeats are the
    planted ones."""
    two = _hexpad("two-way", 50)
    three = _hexpad("three-way", 50)
    rows = [
        (1, _hexpad("p1", 8) + two + _hexpad("s1", 40)),
        (2, _hexpad("p2", 8) + two + _hexpad("s2", 40)),
        (3, _hexpad("p3", 8) + three + _hexpad("s3", 40)),
        (4, _hexpad("p4", 8) + three + _hexpad("s4", 40)),
        (5, _hexpad("p5", 8) + three + _hexpad("s5", 40)),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = sorted(map(tuple, dedup_text.duplicated_window_stats(d).collect()))
    hashed = sorted(
        map(tuple, dedup_text.duplicated_window_stats(d, mode="hashed").collect())
    )
    assert exact == hashed
    by_id = {t[0]: t for t in exact}
    assert all(by_id[i][2] == 50 - 40 + 1 for i in (1, 2, 3, 4, 5))
    strict = {
        r.doc_id: r.dup_windows
        for r in dedup_text.duplicated_window_stats(d, min_docs=3).collect()
    }
    assert strict[1] == 0 and strict[2] == 0  # two-way passage dropped
    assert strict[3] == 11 and strict[4] == 11 and strict[5] == 11


def test_substring_dup_stride_screen(spark):
    """stride>1 is the cheaper screen: total_windows shrinks ~stride×, and
    a long duplicated PREFIX (alignment phase 0 in both docs) is still
    caught; results remain oracle-consistent integer arithmetic."""
    pre = _hexpad("prefix", 80)  # identical 80-char prefix in both docs
    rows = [
        (1, pre + "1" + _hexpad("tail1", 30)),
        (2, pre + "2" + _hexpad("tail2", 30)),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in dedup_text.duplicated_window_stats(
            d, length=40, stride=20, min_docs=2
        ).collect()
    }
    for i in (1, 2):
        assert out[i].dup_windows == 3  # windows at 0, 20, 40 lie in the prefix
        full = len(rows[i - 1][1]) - 40 + 1
        assert out[i].total_windows == (full - 1) // 20 + 1


def test_remove_duplicated_spans_exact_boundaries(spark):
    """r3 verdict #3 (detector -> transform): planted shared passages are
    excised with EXACT span boundaries — the cleaned text is the original
    minus precisely the shared 60 chars (boundary chars differ on both
    sides, so no covering window can straddle out of the passage); unique
    docs and sub-window docs pass through untouched with 0/0."""
    shared = _hexpad("shared", 60)
    t1, t2 = _hexpad("t1", 40), _hexpad("t2", 40)
    rows = [
        (1, "A" + shared + "B" + t1),
        (2, "C" + shared + "D" + t2),
        (3, _hexpad("solo", 100)),
        (4, "short doc"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in dedup_text.remove_duplicated_spans(
            d, length=40, min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # the transform keeps every doc
    # the span is exactly the shared passage, removed from BOTH docs
    assert out[1].text == "A" + "B" + t1
    assert out[2].text == "C" + "D" + t2
    for i in (1, 2):
        assert out[i].n_dup_spans == 1
        assert out[i].dup_chars_removed == 60
    for i in (3, 4):
        assert out[i].text == rows[i - 1][1]
        assert out[i].n_dup_spans == 0 and out[i].dup_chars_removed == 0


def test_remove_duplicated_spans_merges_overlaps_and_hashed_mode(spark):
    """Two shared passages in one doc separated by less than one window
    length of unique text still yield two DISJOINT spans when the gap
    windows are unique (no window bridges them), but passages ABUTTING each
    other merge into one maximal span. mode='hashed' (the 100 TB exchange
    shape) produces byte-identical output. A doc that is ENTIRELY one
    shared passage cleans to the empty string."""
    p1, p2 = _hexpad("p1", 45), _hexpad("p2", 45)
    rows = [
        (1, p1 + "x" * 3 + p2),          # two spans, 3-char unique gap
        (2, _hexpad("f2", 20) + p1 + _hexpad("g2", 20) + p2),
        (3, p1),                          # whole doc duplicated elsewhere
        (4, p1 + _hexpad("t4", 50)),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {r.doc_id: r for r in dedup_text.remove_duplicated_spans(
        d, length=40, min_docs=2).collect()}
    hashed = {r.doc_id: r for r in dedup_text.remove_duplicated_spans(
        d, length=40, min_docs=2, mode="hashed").collect()}
    assert {k: tuple(v) for k, v in exact.items()} == {
        k: tuple(v) for k, v in hashed.items()
    }
    # doc 1: "x"*3 gap is < 40 so every window covering it also covers
    # unique bytes -> gap survives; the two passages are excised
    assert exact[1].text == "x" * 3
    assert exact[1].n_dup_spans == 2 and exact[1].dup_chars_removed == 90
    # doc 3 is entirely one duplicated passage -> empty after excision
    assert exact[3].text == "" and exact[3].dup_chars_removed == 45
    # doc 4 keeps its unique tail intact
    assert exact[4].text == _hexpad("t4", 50)


# --------------------------------------------- real stdlib media codecs (r4)
def _png_with_filters(pixels, filters):
    """Fixture twin of multimodal.decode_png exercising CHOSEN per-row
    filter types: applies each filter's forward transform so the decoder's
    unfiltering of all five types is verified against the source pixels."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = pixels.shape
    raw = b""
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in zip(range(h), filters):
        cur = pixels[y].reshape(-1).astype(np.int32)
        line = np.empty(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) % 256
        raw += bytes([f]) + bytes(line.astype(np.uint8))
        prev = cur

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def _det_pixels(h, w, ch, seed=7):
    import numpy as np

    n = h * w * ch
    vals = [(seed * 131 + i * 89 + (i * i) % 251) % 256 for i in range(n)]
    return np.array(vals, dtype=np.uint8).reshape(h, w, ch)


def test_png_decode_all_filter_types_and_roundtrip():
    import numpy as np

    for ch in (1, 2, 3, 4):
        px = _det_pixels(5, 6, ch)
        data = _png_with_filters(px, [0, 1, 2, 3, 4])
        got = multimodal.decode_png(data)
        assert got.shape == (5, 6, ch)
        assert np.array_equal(got, px), f"channels={ch}"
    # the shipped encoder round-trips through the decoder too
    px = _det_pixels(9, 4, 3, seed=11)
    assert np.array_equal(multimodal.decode_png(multimodal.encode_png(px)), px)


def _wav_bytes(n=800, rate=8000, nch=2, width=2):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        frames = b""
        for i in range(n):
            v = int(12000 * math.sin(2 * math.pi * 440 * i / rate))
            if width == 2:
                frames += struct.pack("<h", v) * nch
            else:
                frames += bytes([(v // 256 + 128) & 0xFF]) * nch
        w.writeframes(frames)
    return buf.getvalue()


def test_wav_decode_roundtrip_and_features():
    import numpy as np

    data = _wav_bytes(n=800, rate=8000, nch=2, width=2)
    samples, rate = multimodal.decode_wav(data)
    assert rate == 8000 and samples.shape == (800, 2)
    assert np.abs(samples).max() <= 1.0
    feat = multimodal.audio_feature_vec(samples)
    assert feat.shape == (8,) and (feat > 0).all()  # a tone has energy everywhere
    # 8-bit path
    s8, r8 = multimodal.decode_wav(_wav_bytes(n=100, rate=4000, nch=1, width=1))
    assert r8 == 4000 and s8.shape == (100, 1)


def test_strict_mode_decodes_real_png_and_wav_media(spark):
    """r3 verdict #7: strict mode (the production contract) now really
    decodes two modalities with zero external deps; non-PNG/non-WAV still
    raises. Fake-codec mode is unchanged for everything."""
    import numpy as np
    import pytest

    px = _det_pixels(8, 8, 3)
    rows = [
        (0, "image", bytearray(multimodal.encode_png(px)), ("png", 8, 8, None)),
        (1, "audio", bytearray(_wav_bytes()), ("wav", None, None, 100)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    img = multimodal.extract_image_features(media, strict=True).collect()
    assert len(img) == 1 and len(img[0].feature) == 8
    assert abs(sum(img[0].feature) - 1.0) < 1e-5  # normalized histogram
    want = multimodal.image_feature_vec(px)
    assert np.allclose(img[0].feature, want, atol=1e-6)

    aud = multimodal.extract_audio_features(media, strict=True).collect()
    assert len(aud) == 1 and aud[0].sample_rate == 8000
    assert aud[0].n_samples == 800 and len(aud[0].feature) == 8

    # fake mode unchanged on arbitrary bytes; strict still raises on them
    fake = multimodal.synthetic_media(spark, n=6)
    assert multimodal.extract_audio_features(fake, strict=False).count() == 2
    with pytest.raises(Exception, match="NotImplementedError|codec|WAV"):
        multimodal.extract_audio_features(fake, strict=True).collect()


def test_q_media_decode_is_deterministic(spark):
    """The rows-only driver query over REAL stdlib-decoded PNG/WAV media
    must be stable across runs (no RNG anywhere in payload synthesis or
    decode) — the property the driver's rows-only check leans on."""
    import maestro_spark.queries2  # noqa: F401
    from maestro_spark.queries import QUERIES

    a = sorted(map(tuple, QUERIES["q_media_decode"](spark, "unused").collect()))
    b = sorted(map(tuple, QUERIES["q_media_decode"](spark, "unused").collect()))
    assert a == b and len(a) == 16
    kinds = {r[1] for r in a}
    assert kinds == {"image", "audio", "video"}  # AVI joined the set in r5


def test_subword_count_engine_parity_and_shape(spark):
    """BPE-ish pre-token counts: the ONE RE2-safe pattern produces
    identical counts in Spark and DuckDB (the oracle contract), and tracks
    the expected piece structure on hand-checked strings."""
    import duckdb

    from maestro_spark.functions.text import PRETOKEN_RE, subword_count

    rows = ["Hello, world!", "it's 2025: GPT-4 rocks", "", "   ",
            "don't I'll we're", "multi\nline text 123", "a-b_c.d", None]
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    got = [r[0] for r in df.select(subword_count(F.col("text"))).collect()]
    duck = [
        duckdb.sql("SELECT COALESCE(len(regexp_extract_all(?, ?)), 0)",
                   params=[t, PRETOKEN_RE]).fetchone()[0]
        for t in rows
    ]
    assert got == duck
    # "Hello" "," " world" "!" -> 4 pieces; null/empty -> 0
    assert got[0] == 4 and got[2] == 0 and got[-1] == 0


def test_jpeg_codec_roundtrip_and_spec_independence():
    """Baseline JPEG decode (r5): encoder-twin round trip within lossy
    bounds at several qualities, flat-color near-exactness, determinism,
    AND decode of an INDEPENDENTLY-encoded fixture (a third-party-encoder
    2x2 flat-gray baseline JPEG, embedded; from the IPython test suite,
    BSD) — proving the decoder implements the spec, not just its twin."""
    import base64

    import numpy as np
    import pytest

    from maestro_spark.functions.jpeg import decode_jpeg, encode_jpeg

    h, w = 24, 40
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([
        (x * 255 // (w - 1)).astype(np.uint8),
        (y * 255 // (h - 1)).astype(np.uint8),
        ((x * 3 + y * 5) % 256).astype(np.uint8),
    ], axis=-1)
    for q, bound in ((95, 4.0), (75, 8.0)):
        out = decode_jpeg(encode_jpeg(px, quality=q))
        assert out.shape == px.shape and out.dtype == np.uint8
        assert np.abs(out.astype(int) - px.astype(int)).mean() < bound, q
    flat = np.full((16, 16, 3), 137, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 90)) == 137).all()
    g = ((x + y) % 256).astype(np.uint8)
    og = decode_jpeg(encode_jpeg(g, 95))  # grayscale -> replicated RGB
    assert og.shape == (h, w, 3) and (og[..., 0] == og[..., 1]).all()
    assert encode_jpeg(px, 90) == encode_jpeg(px, 90)  # deterministic

    # independently-encoded fixture: 2x2, flat 128-gray, 4:2:0 baseline
    fixture = base64.b64decode(
        "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkSEw8U"
        "HRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAACAAIBAREA"
        "/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQA"
        "AAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJico"
        "KSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKT"
        "lJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo"
        "6erx8vP09fb3+Pn6/9oACAEBAAA/ACv/2Q=="
    )
    out = decode_jpeg(fixture)
    assert out.shape == (2, 2, 3)
    assert np.abs(out.astype(int) - 128).max() <= 1  # flat mid-gray

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_strict_mode_decodes_real_jpeg_media(spark):
    """synthetic_real_media now plants REAL baseline JPEG rows (i%4==2);
    the strict mapInPandas pipeline decodes them end to end and the
    features match a local decode of the same bytes."""
    import numpy as np

    from maestro_spark.functions import multimodal as mm
    from maestro_spark.functions.jpeg import decode_jpeg

    media = mm.synthetic_real_media(spark, n=16)
    jpegs = {r["media_id"]: bytes(r["payload"])
             for r in media.filter(F.col("meta.codec") == "jpeg").collect()}
    assert len(jpegs) == 4  # ids 2, 6, 10, 14
    feats = {r["media_id"]: np.array(r["feature"])
             for r in mm.extract_image_features(media, strict=True).collect()}
    for mid, payload in jpegs.items():
        exp = mm.image_feature_vec(decode_jpeg(payload))
        assert np.allclose(feats[mid], exp, atol=1e-6), mid


def test_avi_codec_roundtrip_and_spec_independence():
    """Uncompressed-AVI video codec (r5): encoder-twin LOSSLESS round trip
    (incl. odd widths exercising 4-byte stride padding), cadence sampling,
    top-down (negative biHeight) handling, and refusal of compressed
    payloads — the last multimodal stub un-stubbed for the one container
    shape that needs no external codec library."""
    import struct

    import numpy as np
    import pytest

    from maestro_spark.functions.video import (
        decode_avi, encode_avi, sample_indices, video_feature_vec,
    )

    nf, h, w = 7, 12, 9  # odd width -> padded stride
    j = np.arange(nf * h * w * 3, dtype=np.int64)
    clip = ((j * 31 + (j * j) % 97) % 256).astype(np.uint8).reshape(nf, h, w, 3)
    data = encode_avi(clip, fps=5)
    out, fps, total = decode_avi(data)
    assert fps == 5 and total == nf
    assert (out == clip).all()  # LOSSLESS — uncompressed DIB
    assert encode_avi(clip, fps=5) == data  # deterministic

    # sampled decode == the same frames of a full decode
    idx = sample_indices(total, fps, every_ms=400)  # every 2nd frame
    assert idx == [0, 2, 4, 6]
    sub, _, _ = decode_avi(data, frame_indices=idx)
    assert (sub == clip[idx]).all()

    vec = video_feature_vec(sub)
    assert vec.shape == (8,) and vec.dtype == np.float32
    assert (vec >= 0).all() and (vec <= 1).all()

    # spec independence: flip biHeight positive->negative (top-down) and
    # rewrite the frame rows in top-down order — decode must match still
    pos = data.find(struct.pack("<Ii", 40, w))  # strf BITMAPINFOHEADER
    assert pos > 0
    td = bytearray(data)
    td[pos + 8 : pos + 12] = struct.pack("<i", -h)
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h
    off = 0
    for _ in range(nf):
        off = td.index(b"00db", off) + 8
        rows = np.frombuffer(bytes(td[off : off + frame_bytes]), np.uint8)
        td[off : off + frame_bytes] = rows.reshape(h, stride)[::-1].tobytes()
        off += frame_bytes
    out_td, _, _ = decode_avi(bytes(td))
    assert (out_td == clip).all()

    # compressed AVI refuses with a clear error
    comp = bytearray(data)
    comp[pos + 16 : pos + 20] = struct.pack("<I", 0x34363248)  # 'H264'
    with pytest.raises(NotImplementedError, match="codec library"):
        decode_avi(bytes(comp))
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_strict_mode_decodes_real_avi_media(spark):
    """synthetic_real_media(with_video=True) plants REAL uncompressed AVI
    clips (i%3==2); the strict mapInPandas pipeline decodes + samples them
    end to end and features match a local decode of the same bytes."""
    import numpy as np

    from maestro_spark.functions import multimodal as mm
    from maestro_spark.functions.video import (
        decode_avi, sample_indices, video_feature_vec,
    )

    media = mm.synthetic_real_media(spark, n=12, with_video=True)
    avis = {r["media_id"]: bytes(r["payload"])
            for r in media.filter(F.col("kind") == "video").collect()}
    assert set(avis) == {2, 5, 8, 11}
    got = {r["media_id"]: r for r in
           mm.extract_video_features(media, strict=True, every_ms=300).collect()}
    assert set(got) == set(avis)
    for mid, b in avis.items():
        _, fps, total = decode_avi(b, frame_indices=[])
        idx = sample_indices(total, fps, every_ms=300)
        frames, _, _ = decode_avi(b, frame_indices=idx)
        exp = video_feature_vec(frames)
        r = got[mid]
        assert r["fps"] == fps and r["n_frames"] == total
        assert r["n_sampled"] == len(idx) and r["n_bytes"] == len(b)
        assert np.allclose(np.array(r["feature"], dtype=np.float32), exp)
    # image/audio extraction still sees only its own kind
    assert mm.extract_image_features(media, strict=True).count() == 4


def test_mjpeg_avi_codec(monkeypatch):
    """Motion-JPEG AVI (r5 final): near-lossless round trip through the
    native JPEG codec, LAZY per-frame decode (unsampled chunks never hit
    the JPEG decoder), MCU-padded foreign frames crop to the container
    box, and non-MJPG compression still refuses."""
    import numpy as np
    import pytest

    from maestro_spark.functions import jpeg as J
    from maestro_spark.functions import video as V

    nf, h, w = 6, 24, 33
    y, x = np.mgrid[0:h, 0:w]
    clip = np.stack([
        np.stack([(x * 3 + t * 11) % 256, (y * 5 + t * 7) % 256,
                  ((x + y) * 2 + t * 13) % 256], axis=-1).astype(np.uint8)
        for t in range(nf)
    ])
    data = V.encode_avi_mjpeg(clip, fps=12, quality=95)
    out, fps, total = V.decode_avi(data)
    assert fps == 12 and total == nf and out.shape == clip.shape
    err = np.abs(out.astype(int) - clip.astype(int)).mean()
    assert err < 4.0, err  # smooth gradients survive JPEG q95 nearly intact
    assert V.encode_avi_mjpeg(clip, fps=12, quality=95) == data

    # laziness: decoding frames [1, 4] must invoke the JPEG codec twice
    calls = []
    real = J.decode_jpeg
    monkeypatch.setattr(J, "decode_jpeg", lambda b: calls.append(1) or real(b))
    sub, _, _ = V.decode_avi(data, frame_indices=[1, 4])
    assert len(calls) == 2 and (sub[0] == out[1]).all() and (sub[1] == out[4]).all()
    calls.clear()
    _, _, n_total = V.decode_avi(data, frame_indices=[])  # metadata probe
    assert n_total == nf and calls == []
    monkeypatch.setattr(J, "decode_jpeg", real)

    # foreign encoders round frames up to MCU multiples: a 16x16 JPEG in a
    # container declaring 14x13 crops to the declared box
    big = np.arange(16 * 16 * 3, dtype=np.int64) % 256
    big = big.astype(np.uint8).reshape(16, 16, 3)
    d2 = V.encode_avi_mjpeg(big[None, :14, :13], fps=5, quality=95)
    jpeg_chunk = J.encode_jpeg(big, quality=95)
    i = d2.index(b"00dc")
    import struct as _st
    (old_len,) = _st.unpack("<I", d2[i + 4 : i + 8])
    patched = (d2[:i] + b"00dc" + _st.pack("<I", len(jpeg_chunk)) + jpeg_chunk
               + (b"\x00" if len(jpeg_chunk) % 2 else b""))
    f2, _, _ = V.decode_avi(patched)
    assert f2.shape == (1, 14, 13, 3)
    ref = real(jpeg_chunk)
    assert (f2[0] == ref[:14, :13]).all()
