"""Dedup / similarity / text-analysis operators on synthetic documents, with
numpy / python-set oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mtsad_spark.functions.text import (
    bpe_ish_token_count,
    content_fingerprint,
    rolling_hash_fingerprints,
    whitespace_token_count,
    with_lang_id,
    with_quality_features,
)
from mtsad_spark.operators.dedup import (
    exact_dedup,
    drop_exact_dups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    simhash,
    simhash_dup_pairs,
    word_shingles,
)
from mtsad_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    with_cosine,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quick", "rapid")),  # near dup of 0
        (3, "völlig anderes dokument über der die und das ist thema heute"),
        (4, "le chat noir et le chien blanc sont les amis des enfants"),
        (5, "un texto en español que habla de el mar y los barcos que vienen"),
        (6, "short"),
        (7, "the " * 30),
        (8, base + " with a small extra suffix attached here"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).cache()


def test_exact_dedup(spark, docs):
    groups = exact_dedup(docs, "doc_id", "text").toPandas()
    dup = groups[groups["dup_count"] > 1]
    assert len(dup) == 1 and dup.iloc[0]["dup_count"] == 2
    assert dup.iloc[0]["canonical_id"] == 0
    kept = drop_exact_dups(docs, "doc_id", "text").toPandas()
    assert len(kept) == 8  # 9 docs, one exact dup removed
    assert 1 not in set(kept["doc_id"])


def test_shingles_and_jaccard_oracle(spark, docs):
    sh = word_shingles(docs, "doc_id", "text", k=3)
    pdf = docs.toPandas()

    def oracle_shingles(text):
        ws = text.lower().split()
        return {" ".join(ws[i : i + 3]) for i in range(max(len(ws) - 3, 0) + 1)}

    got = sh.toPandas().groupby("doc_id")["shingle"].apply(set).to_dict()
    for _, row in pdf.iterrows():
        assert got.get(row["doc_id"], set()) == oracle_shingles(row["text"]), row["doc_id"]

    pairs = spark.createDataFrame(pd.DataFrame({"id_a": [0], "id_b": [2]}))
    j = jaccard_pairs(pairs, sh, "doc_id").collect()[0]["jaccard"]
    a, b = oracle_shingles(pdf.iloc[0]["text"]), oracle_shingles(pdf.iloc[2]["text"])
    assert j == pytest.approx(len(a & b) / len(a | b))


def test_minhash_lsh_finds_near_dups(spark, docs):
    out = minhash_dedup(docs, "doc_id", "text", k=3, n_hashes=64, bands=16, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs  # exact dup certainly caught
    # near dups (0,2) and (0,8) should be caught at threshold 0.5
    assert (0, 2) in pairs
    assert (0, 8) in pairs
    # unrelated languages must not pair
    assert all(not ({a, b} & {3, 4, 5}) for a, b in pairs)


def test_minhash_signature_is_true_min(spark, docs):
    """Signature column i must equal the true min of the i-th derived hash
    h_i = a_i·xxhash64(shingle, seed) + b_i over the doc's shingle SET, with
    Java-long wrap-around arithmetic (replicated via int64 numpy wrapping)."""
    sh = word_shingles(docs, "doc_id", "text", k=3)
    sigs = minhash_signatures(sh, "doc_id", n_hashes=4).toPandas().set_index("doc_id")
    shp = sh.withColumn("h0", F.xxhash64(F.col("shingle"), F.lit(42))).toPandas()
    rng = np.random.RandomState(42)
    a = rng.randint(1, 2**63 - 1, size=4, dtype=np.int64) | np.int64(1)
    b = rng.randint(1, 2**63 - 1, size=4, dtype=np.int64)
    h = shp["h0"].to_numpy(dtype=np.int64)
    with np.errstate(over="ignore"):
        for i in range(4):
            shp[f"m{i}"] = a[i] * h + b[i]
    for i in range(4):
        want = shp.groupby("doc_id")[f"m{i}"].min()
        got = sigs[f"mh_{i}"]
        for d in want.index:
            assert got[d] == want[d], (i, d)


def test_word_shingle_keys_match_string_hashes(spark, docs):
    """The hashed-key shingle frame (r7 fused build) must hold exactly
    {xxhash64(shingle, 42)} over the string frame's per-doc shingle SET —
    including the short-doc (< k words) and empty-doc edge arms of the fused
    CASE."""
    from mtsad_spark.operators.dedup import word_shingle_keys

    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100, 101, 102], "text": ["one two", "solo", "   "]})
    )
    d = docs.select("doc_id", "text").unionByName(extra)
    want = (
        word_shingles(d, "doc_id", "text", k=3)
        .withColumn("sk", F.xxhash64(F.col("shingle"), F.lit(42)))
        .toPandas()
        .groupby("doc_id")["sk"]
        .apply(set)
        .to_dict()
    )
    got = (
        word_shingle_keys(d, "doc_id", "text", k=3)
        .toPandas()
        .groupby("doc_id")["sk"]
        .apply(set)
        .to_dict()
    )
    assert got == want
    # non-distinct form: same set after dedup, never fewer occurrences
    raw = word_shingle_keys(d, "doc_id", "text", k=3, distinct=False).toPandas()
    assert raw.groupby("doc_id")["sk"].apply(set).to_dict() == want


def test_simhash_lane_packed_votes_per_bit(spark, docs):
    """Per-bit oracle for the lane-packed simhash (r7): every one of the 64
    sig bits must equal sign(2·c_i − n) computed from the raw token hashes —
    pins the 32-bit lane unpack (low mask / unsigned high shift) exactly."""
    toks = (
        docs.select("doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"))
        .filter(F.length("tok") > 0)
        .withColumn("h", F.xxhash64(F.col("tok"), F.lit(42)))
        .toPandas()
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    for doc_id, grp in toks.groupby("doc_id"):
        h = grp["h"].to_numpy(dtype=np.uint64)
        n = len(h)
        sig = 0
        for i in range(64):
            c = int(((h >> np.uint64(i)) & np.uint64(1)).sum())
            if 2 * c > n:
                sig |= 1 << i
        expected = sig - (1 << 64) if sig >= (1 << 63) else sig
        assert got[doc_id] == expected, doc_id


def test_simhash_near_dup(spark, docs):
    sigs = simhash(docs, "doc_id", "text")
    pairs = simhash_dup_pairs(sigs, "doc_id", max_hamming=10).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got  # identical text ⇒ hamming 0
    h01 = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 1)]["hamming"].iloc[0]
    assert h01 == 0


def test_cosine_topk_vs_numpy(spark):
    rng = np.random.RandomState(5)
    emb = rng.randn(100, 16).astype(np.float64)
    pdf = pd.DataFrame({"vec_id": range(100), "embedding": [list(map(float, e)) for e in emb]})
    df = spark.createDataFrame(pdf)
    queries = df.filter("vec_id < 3")
    got = cosine_topk_bruteforce(df, queries, k=5).toPandas()
    norms = np.linalg.norm(emb, axis=1)
    sims = emb @ emb.T / np.outer(norms, norms)
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf
        top = np.argsort(-s, kind="stable")[:5]
        mine = got[got["query_id"] == q].sort_values("rank")
        assert list(mine["neighbor_id"]) == list(top)
        assert np.allclose(mine["cosine"].values, s[top], rtol=1e-9)


def test_lsh_ann_recall(spark):
    rng = np.random.RandomState(6)
    # clustered corpus so LSH buckets are meaningful
    centers = rng.randn(5, 16) * 4
    emb = np.vstack([c + rng.randn(40, 16) * 0.3 for c in centers])
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [list(map(float, e)) for e in emb]})
    df = spark.createDataFrame(pdf)
    queries = df.filter("vec_id IN (0, 40, 80)")
    exact = cosine_topk_bruteforce(df, queries, k=5).toPandas()
    approx = cosine_topk_lsh(df, queries, dim=16, k=5, n_planes=4).toPandas()
    # recall@5 ≥ 0.6 on well-separated clusters
    rec = 0.0
    for q in (0, 40, 80):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        rec += len(e & a) / 5
    assert rec / 3 >= 0.6


def test_token_counts_and_quality(spark, docs):
    out = (
        docs.withColumn("n_ws", whitespace_token_count(F.col("text")))
        .withColumn("n_bpe", bpe_ish_token_count(F.col("text")))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_ws"] == len("the quick brown fox jumps over the lazy dog and runs far away today".split())
    assert out.loc[6, "n_ws"] == 1
    assert (out["n_bpe"] >= out["n_ws"]).all()

    q = with_quality_features(docs, "text").toPandas().set_index("doc_id")
    assert bool(q.loc[0, "quality_ok"])
    assert not bool(q.loc[6, "quality_ok"])  # too short


def test_lang_id(spark, docs):
    out = with_lang_id(docs, "text").toPandas().set_index("doc_id")["lang_pred"]
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[4] == "fr"
    assert out[5] == "es"


def test_fingerprints(spark, docs):
    fp = docs.withColumn("fp", content_fingerprint(F.col("text"))).toPandas().set_index("doc_id")["fp"]
    assert fp[0] == fp[1]  # exact dups share fingerprint
    assert fp[0] != fp[2]
    rh = rolling_hash_fingerprints(docs, "doc_id", "text").toPandas()
    assert {0, 1} <= set(rh["doc_id"])
    # identical docs → identical fingerprint sets
    s0 = set(rh[rh["doc_id"] == 0]["fp"])
    s1 = set(rh[rh["doc_id"] == 1]["fp"])
    assert s0 == s1 and len(s0) > 0


def test_ivf_ann_recall(spark):
    rng = np.random.RandomState(8)
    centers = rng.randn(6, 16) * 5
    emb = np.vstack([c + rng.randn(50, 16) * 0.4 for c in centers])
    pdf = pd.DataFrame({"vec_id": range(300), "embedding": [list(map(float, e)) for e in emb]})
    df = spark.createDataFrame(pdf)
    queries = df.filter("vec_id IN (0, 50, 100)")
    from mtsad_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_ivf

    exact = cosine_topk_bruteforce(df, queries, k=5).toPandas()
    approx = cosine_topk_ivf(df, queries, k=5, n_lists=8, n_probe=3).toPandas()
    rec = 0.0
    for q in (0, 50, 100):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        rec += len(e & a) / 5
    assert rec / 3 >= 0.8  # clustered data, 3/8 lists probed


def test_embedding_near_dups(spark):
    rng = np.random.RandomState(9)
    base = rng.randn(40, 16)
    # rows 100.. are near-copies of rows 0.. (tiny perturbation → cosine ≈ 1)
    near = base + rng.randn(40, 16) * 0.01
    emb = np.vstack([base, rng.randn(60, 16), near])
    ids = list(range(40)) + list(range(40, 100)) + list(range(100, 140))
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [list(map(float, e)) for e in emb]})
    df = spark.createDataFrame(pdf)
    from mtsad_spark.operators.similarity import embedding_near_dups

    out = embedding_near_dups(df, dim=16, threshold=0.98, n_planes=6).toPandas()
    got = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    expected = {(i, i + 100) for i in range(40)}
    # LSH recall < 1 by construction; most true near-dups must surface and
    # every reported pair must truly be ≥ threshold
    assert len(got & expected) >= 0.5 * len(expected)
    norms = np.linalg.norm(emb, axis=1)
    id2row = {v: i for i, v in enumerate(ids)}
    for a, b in got:
        ia, ib = id2row[a], id2row[b]
        cos = emb[ia] @ emb[ib] / (norms[ia] * norms[ib])
        assert cos >= 0.98 - 1e-9


def test_simhash_pigeonhole_scales_with_max_hamming(spark):
    """Pairs within max_hamming MUST be found even when their differing bits
    hit many chunks (the fixed-4-chunk scheme missed these)."""
    import pandas as pd

    # craft signatures: b differs from a in exactly 6 bits spread widely
    a = 0x0F0F0F0F0F0F0F0F
    bits = [0, 11, 22, 33, 44, 55]
    b = a
    for x in bits:
        b ^= 1 << x
    def to_long(u):
        return u - (1 << 64) if u >= (1 << 63) else u
    sigs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "simhash": [to_long(a), to_long(b)]})
    )
    from mtsad_spark.operators.dedup import simhash_dup_pairs

    out = simhash_dup_pairs(sigs, "doc_id", max_hamming=6).toPandas()
    assert len(out) == 1 and out.iloc[0]["hamming"] == 6
    # and beyond the bound the pair must NOT appear
    out2 = simhash_dup_pairs(sigs, "doc_id", max_hamming=5).toPandas()
    assert len(out2) == 0


def test_dropin_zero_drops_rows(spark):
    from mtsad_spark.operators.splits import dropin_augment
    from pyspark.sql import functions as F

    base = spark.range(2000).withColumn("v", F.col("id"))
    aug = dropin_augment(base, factor_max=10, seed=3)
    counts = aug.groupBy("id").count().toPandas()
    # rows with n==0 are genuinely dropped (≈10% of inputs)
    assert len(counts) < 2000
    # and no row is duplicated more than factor_max-1 times
    assert counts["count"].max() <= 9


def test_multi_table_lsh_raises_near_dup_recall_above_090(spark):
    """VERDICT r01 #10 done-condition: union over independent plane seeds
    lifts near-dup recall ≥ 0.9 on clustered data (single-table at the same
    plane count is documented ~0.6-0.9)."""
    import pandas as pd

    from mtsad_spark.operators.similarity import embedding_near_dups

    rng = np.random.RandomState(21)
    base = rng.randn(50, 16)
    near = base + rng.randn(50, 16) * 0.01
    emb = np.vstack([base, rng.randn(80, 16), near])
    ids = list(range(50)) + list(range(50, 130)) + list(range(1000, 1050))
    pdf = pd.DataFrame({"vec_id": ids, "embedding": [list(map(float, e)) for e in emb]})
    df = spark.createDataFrame(pdf)
    out = embedding_near_dups(
        df, dim=16, threshold=0.98, n_planes=8, n_tables=4
    ).toPandas()
    got = {(a, b) for a, b in zip(out["id_a"], out["id_b"])}
    expected = {(i, i + 1000) for i in range(50)}
    assert len(got & expected) >= 0.9 * len(expected), len(got & expected)
    # precision stays exact (verify step): every reported pair truly qualifies
    norms = np.linalg.norm(emb, axis=1)
    id2row = {v: i for i, v in enumerate(ids)}
    for a, b in got:
        ia, ib = id2row[a], id2row[b]
        cos = emb[ia] @ emb[ib] / (norms[ia] * norms[ib])
        assert cos >= 0.98 - 1e-9


def test_ivf_pretrained_centroids_full_probe_equals_bruteforce(spark):
    """The pre-trained-quantizer seam (cosine_topk_ivf centroids=...): with
    n_probe == n_lists every list is probed, so IVF must return EXACTLY the
    brute-force top-k — the quantizer only routes, never changes scores."""
    import pandas as pd

    from mtsad_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_ivf

    rng = np.random.RandomState(17)
    vecs = rng.randn(120, 16)
    pdf = pd.DataFrame(
        {"vec_id": range(120), "embedding": [list(map(float, v)) for v in vecs]}
    )
    df = spark.createDataFrame(pdf).cache()
    q = df.filter("vec_id < 4")
    cents = [list(map(float, v)) for v in vecs[:6]]
    got = (
        cosine_topk_ivf(df, q, k=5, n_lists=6, n_probe=6, centroids=cents)
        .orderBy("query_id", "rank")
        .toPandas()
    )
    want = cosine_topk_bruteforce(df, q, k=5).orderBy("query_id", "rank").toPandas()
    assert list(got["neighbor_id"]) == list(want["neighbor_id"])
    assert list(got["rank"]) == list(want["rank"])
    assert np.allclose(got["cosine"], want["cosine"], rtol=0, atol=1e-12)


def test_multi_table_lsh_ann_recall_above_090(spark):
    """Multi-table cosine_topk_lsh recall@k ≥ 0.9 on clustered vectors vs the
    brute-force ground truth."""
    import pandas as pd

    from mtsad_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh

    rng = np.random.RandomState(22)
    centers = rng.randn(10, 16) * 3
    vecs = np.vstack([c + rng.randn(30, 16) * 0.3 for c in centers])
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]}
    )
    df = spark.createDataFrame(pdf).cache()
    q = df.filter("vec_id % 60 = 0")
    truth = cosine_topk_bruteforce(df, q, k=5).toPandas()
    got = cosine_topk_lsh(df, q, dim=16, k=5, n_planes=8, n_tables=6).toPandas()
    t_pairs = {(r.query_id, r.neighbor_id) for r in truth.itertuples()}
    g_pairs = {(r.query_id, r.neighbor_id) for r in got.itertuples()}
    assert len(t_pairs & g_pairs) >= 0.9 * len(t_pairs), (len(t_pairs & g_pairs), len(t_pairs))


def test_dup_groups_connected_components(spark):
    """dup_groups == union-find oracle (min member id per component),
    including a 12-node path (worst-case propagation depth) and singleton
    edge pairs."""
    import pandas as pd

    from mtsad_spark.operators.dedup import dup_groups

    rng = np.random.RandomState(17)
    edges = set()
    # three random clusters
    for base in (0, 100, 200):
        members = [base + i for i in range(rng.randint(3, 9))]
        for m in members[1:]:
            edges.add((min(members[0], m), max(members[0], m)))
        for _ in range(3):
            x, y = rng.choice(members, 2)
            if x != y:
                edges.add((min(x, y), max(x, y)))
    # a 12-node path: 300-301-...-311
    for i in range(300, 311):
        edges.add((i, i + 1))
    pairs = spark.createDataFrame(
        pd.DataFrame(sorted(edges), columns=["id_a", "id_b"])
    )
    got = dup_groups(pairs).toPandas().set_index("id")["group_id"].to_dict()

    parent: dict[int, int] = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    assert got == want


def test_hot_bucket_guard_simhash_pathological_corpus(spark):
    """VERDICT r03 #5: a corpus of identical documents collapses every chunk
    bucket into one degenerate cell. The guard must (a) complete without the
    quadratic self-join, (b) report the excluded mass via the audit frame,
    and (c) leave healthy-corpus behavior (cap not reached) unchanged."""
    from mtsad_spark.operators.dedup import simhash_oversize_buckets

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("same tiny boilerplate text").alias("text")
    )
    sigs = simhash(docs, "doc_id", "text")
    capped = simhash_dup_pairs(sigs, "doc_id", max_hamming=3, max_bucket=100)
    assert capped.count() == 0  # degenerate buckets excluded, no blow-up
    audit = simhash_oversize_buckets(sigs, "doc_id", max_hamming=3, max_bucket=100)
    a = audit.toPandas()
    assert len(a) == 4 and (a["n"] == 1000).all()  # one oversize cell per chunk
    # below the cap the full quadratic pair set is still produced
    small = simhash_dup_pairs(
        sigs.filter(F.col("doc_id") < 40), "doc_id", max_hamming=3, max_bucket=100
    )
    assert small.count() == 40 * 39 // 2


def test_hot_bucket_guard_embedding_pathological_corpus(spark):
    """Same guard for the embedding near-dup self-join: 1000 identical
    vectors → one (table, bucket) cell."""
    from mtsad_spark.operators.similarity import embedding_near_dups, oversize_buckets

    vec = F.array(*[F.lit(1.0) for _ in range(8)])
    emb = spark.range(1000).select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    capped = embedding_near_dups(emb, dim=8, threshold=0.9, max_bucket=100)
    assert capped.count() == 0
    audit = oversize_buckets(emb, dim=8, max_bucket=100)
    a = audit.toPandas()
    assert len(a) == 1 and int(a["n"].iloc[0]) == 1000
    small = embedding_near_dups(
        emb.filter(F.col("vec_id") < 30), dim=8, threshold=0.9, max_bucket=100
    )
    assert small.count() == 30 * 29 // 2


def test_repeated_spans_vs_python_oracle(spark):
    """repeated_spans must equal a brute-force python sweep: shared-n-gram
    positions merged into maximal spans, min_df/df_cap honored."""
    from mtsad_spark.operators.dedup import repeated_spans

    rng = np.random.default_rng(7)
    n = 4
    vocab = 50_000  # collisions across random docs ~impossible
    docs = {}
    base = rng.integers(0, vocab, size=120).tolist()
    passage = base[30:55]  # 25-token passage planted into several docs
    docs["d0"] = base
    docs["d1"] = rng.integers(0, vocab, size=40).tolist() + passage
    docs["d2"] = passage[:15] + rng.integers(0, vocab, size=60).tolist() + passage[10:]
    docs["d3"] = rng.integers(0, vocab, size=80).tolist()  # no dup content
    docs["d4"] = rng.integers(0, vocab, size=2).tolist()  # shorter than n
    hot = [1, 2, 3, 4]  # a gram planted in MANY docs to exercise df_cap
    for i in range(5, 12):
        docs[f"d{i}"] = rng.integers(0, vocab, size=10).tolist() + hot

    rows = [(k, [int(x) for x in v]) for k, v in docs.items()]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")

    def oracle(min_df, df_cap):
        grams = {}  # gram -> set(doc)
        for k, v in docs.items():
            for i in range(len(v) - n + 1):
                grams.setdefault(tuple(v[i : i + n]), set()).add(k)
        ok = {
            g
            for g, ds in grams.items()
            if len(ds) >= min_df and (df_cap is None or len(ds) <= df_cap)
        }
        out = []
        for k, v in docs.items():
            pos = [i for i in range(len(v) - n + 1) if tuple(v[i : i + n]) in ok]
            spans = []
            for p in pos:
                if spans and p - spans[-1][1] <= n:
                    spans[-1][1] = p
                    spans[-1][2] += 1
                else:
                    spans.append([p, p, 1])
            out += [(k, s, e + n - 1, c) for s, e, c in spans]
        return sorted(out)

    for min_df, df_cap in [(2, None), (2, 5), (3, None)]:
        got = sorted(
            tuple(r)
            for r in repeated_spans(
                df, "doc_id", "tokens", n=n, min_df=min_df, df_cap=df_cap
            )
            .select("doc_id", "span_start", "span_end", "n_grams")
            .collect()
        )
        assert got == oracle(min_df, df_cap), (min_df, df_cap)
    with pytest.raises(ValueError):
        repeated_spans(df, "doc_id", "tokens", min_df=1)


def test_tfidf_top_terms_vs_python(spark):
    """tfidf_top_terms must equal a pure-python recompute (micro-int idf,
    integer scores, score-desc/token-asc ranking), including tie cases."""
    import math

    from mtsad_spark.functions.text import tfidf_top_terms

    docs = {
        1: "apple banana apple cherry apple",
        2: "banana banana cherry date",
        3: "cherry  date\tegg egg egg fig",   # runs of whitespace
        4: "apple apple apple apple",
        5: "zeta zeta yam yam",               # exact tie -> token asc
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = (
        tfidf_top_terms(df, "doc_id", "text", k=3)
        .toPandas()
        .sort_values(["doc_id", "rk"])
        .reset_index(drop=True)
    )

    toks = {d: [t for t in txt.split() if t] for d, txt in docs.items()}
    N = len(docs)
    dfreq = {}
    for d, ts in toks.items():
        for t in set(ts):
            dfreq[t] = dfreq.get(t, 0) + 1
    want = []
    for d, ts in toks.items():
        scores = {}
        for t in set(ts):
            idf_micro = round(math.log((N + 1) / (dfreq[t] + 1)) * 1e6)
            scores[t] = ts.count(t) * int(idf_micro)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want += [
            (d, t, ts.count(t), s, i + 1) for i, (t, s) in enumerate(top)
        ]
    assert sorted(tuple(r) for r in got.itertuples(index=False)) == sorted(want)
    with pytest.raises(ValueError):
        tfidf_top_terms(df, "doc_id", "text", k=0)


def test_token_distribution_drift_vs_python(spark):
    """token_distribution_drift must equal a python recompute of the exact
    integer decomposition AND approximate the textbook smoothed KL."""
    import datetime as dt
    import math

    from mtsad_spark.functions.text import token_distribution_drift

    rng = np.random.default_rng(13)
    V = 40
    t0 = dt.datetime(2024, 1, 1)
    buckets = {}
    buckets[0] = rng.integers(0, 20, size=300).tolist()          # low ids
    buckets[1] = rng.integers(0, 20, size=280).tolist()          # similar
    buckets[2] = rng.integers(10, 40, size=350).tolist()         # shifted
    rows = []
    for b, toks in buckets.items():
        for j in range(0, len(toks), 50):  # several docs per bucket
            rows.append(
                (t0 + dt.timedelta(seconds=600 * b + j // 50), toks[j : j + 50])
            )
    df = spark.createDataFrame(rows, "ts timestamp, tokens array<int>")
    got = {
        r["bucket_ts"]: (r["n_union"], r["kl"])
        for r in token_distribution_drift(df, "ts", "tokens", 600, V).collect()
    }
    assert len(got) == 2

    def py_drift(prev, cur):
        from collections import Counter

        ca, cb = Counter(prev), Counter(cur)
        ta, tb = len(prev) + V, len(cur) + V
        union = sorted(set(ca) | set(cb))
        s = 0
        for t in union:
            cc, cp = cb.get(t, 0) + 1, ca.get(t, 0) + 1
            s += cc * round(math.log((cc * ta) / (cp * tb)) * 1e6)
        s += (V - len(union)) * round(math.log(ta / tb) * 1e6)
        kl_exact = float(s) / (float(tb) * 1e6)
        kl_ref = sum(
            ((cb.get(t, 0) + 1) / tb) * math.log(((cb.get(t, 0) + 1) / tb) / ((ca.get(t, 0) + 1) / ta))
            for t in range(V)
        )
        return len(union), kl_exact, kl_ref

    for b in (1, 2):
        n_u, kl_exact, kl_ref = py_drift(buckets[b - 1], buckets[b])
        bt = t0 + dt.timedelta(seconds=600 * b)
        assert got[bt][0] == n_u, b
        assert got[bt][1] == kl_exact, b          # bitwise vs the integer spec
        assert abs(got[bt][1] - kl_ref) < 1e-4, b  # close to textbook KL
    # the shifted bucket must show much larger drift than the similar one
    assert got[t0 + dt.timedelta(seconds=1200)][1] > 5 * got[t0 + dt.timedelta(seconds=600)][1]


def test_centroid_affinity_vs_python(spark):
    """centroid_affinity must equal the integer spec bitwise, approximate
    true centroid cosine, and order groups by construction: aligned > 0.9,
    opposed < -0.9, orthogonal ≈ 0."""
    rng = np.random.default_rng(23)
    d = 16
    base = rng.normal(size=d)
    groups = {
        "pos": [base + rng.normal(scale=0.05, size=d) for _ in range(20)],
        "pos2": [base + rng.normal(scale=0.05, size=d) for _ in range(15)],
        "neg": [-base + rng.normal(scale=0.05, size=d) for _ in range(18)],
    }
    rows = [
        (g, [float(x) for x in v]) for g, vs in groups.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<float>")
    from mtsad_spark.operators.similarity import centroid_affinity

    got = {
        (r["group_a"], r["group_b"]): r
        for r in centroid_affinity(df, "label", "embedding").collect()
    }
    assert len(got) == 3

    def spec(ga, gb):
        ma, mb = [], []
        for g, out in ((ga, ma), (gb, mb)):
            vs = [np.float32(v) for v in groups[g]]
            n = len(vs)
            for i in range(d):
                s = sum(int(round(float(np.float64(v[i])) * 1e6)) for v in vs)
                # Spark `div` and DuckDB `//` both truncate toward zero
                out.append((abs(s) // n) * (1 if s >= 0 else -1))
        num = sum(a * b for a, b in zip(ma, mb))
        na2 = sum(a * a for a in ma)
        nb2 = sum(b * b for b in mb)
        return float(num) / (np.sqrt(float(na2)) * np.sqrt(float(nb2)))

    for (ga, gb), r in got.items():
        assert r["n_a"] == len(groups[ga]) and r["n_b"] == len(groups[gb])
        assert abs(r["cosine"] - spec(ga, gb)) < 1e-9, (ga, gb)
    assert got[("pos", "pos2")]["cosine"] > 0.9
    assert got[("neg", "pos")]["cosine"] < -0.9
    assert got[("neg", "pos2")]["cosine"] < -0.9


def test_token_drift_contributions_vs_python(spark):
    """Top-k drift attribution must match a python recompute of the exact
    integer terms (|contrib| desc, token asc), with raw counts attached."""
    import datetime as dt
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from mtsad_spark.functions.text import token_drift_contributions

    rng = np.random.default_rng(37)
    V = 40
    t0 = dt.datetime(2024, 1, 1)
    buckets = {
        0: rng.integers(0, 20, size=300).tolist(),
        1: rng.integers(5, 30, size=280).tolist(),
    }
    rows = []
    for b, toks in buckets.items():
        for j, t in enumerate(toks):
            rows.append((t0 + dt.timedelta(seconds=600 * b, microseconds=j), t))
    df = spark.createDataFrame(rows, "ts timestamp, token int")
    cnts = df.groupBy(
        ((F.col("ts").cast("long") / 600).cast("long") * 600)
        .cast("timestamp")
        .alias("bucket_ts"),
        "token",
    ).agg(F.count(F.lit(1)).alias("cnt"))
    k = 7
    got = (
        token_drift_contributions(cnts, 600, V, k=k)
        .toPandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    ca, cb = Counter(buckets[0]), Counter(buckets[1])
    ta, tb = len(buckets[0]) + V, len(buckets[1]) + V
    terms = []
    for t in sorted(set(ca) | set(cb)):
        cc, cp = cb.get(t, 0) + 1, ca.get(t, 0) + 1
        contrib = cc * round(math.log((cc * ta) / (cp * tb)) * 1e6)
        terms.append((t, cb.get(t, 0), ca.get(t, 0), contrib))
    terms.sort(key=lambda x: (-abs(x[3]), x[0]))
    want = [
        (t, ccur, cprev, contrib, i + 1)
        for i, (t, ccur, cprev, contrib) in enumerate(terms[:k])
    ]
    assert [
        (r.token, r.c_cur, r.c_prev, r.contrib_micro, r.rk)
        for r in got.itertuples(index=False)
    ] == want
    assert (got.bucket_ts == t0 + dt.timedelta(seconds=600)).all()


def test_vocab_growth_vs_python(spark):
    """vocab_growth must equal a pure-python first-occurrence scan: per
    group, cumulative tokens and cumulative distinct types at each id
    bucket, with sparse ids and a no-token doc handled."""
    import numpy as np

    from mtsad_spark.functions.text import vocab_growth

    rng = np.random.default_rng(19)
    rows = []
    for g, n_docs, vocab in (("a", 37, 12), ("b", 9, 5)):
        ids = sorted(rng.choice(200, size=n_docs, replace=False).tolist())
        for i in ids:
            toks = rng.integers(0, vocab, size=int(rng.integers(0, 9)))
            rows.append((g, int(i), " ".join(f"w{t}" for t in toks)))
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")

    exp = {}
    for g in ("a", "b"):
        seen, cum_tok, cum_typ = set(), 0, 0
        per_bucket = {}
        for gg, i, text in sorted(rows, key=lambda r: r[1]):
            if gg != g:
                continue
            b = i - i % 10
            toks = text.split()
            nt = sum(1 for t in toks if t not in seen and not seen.add(t))
            per_bucket.setdefault(b, [0, 0])
            per_bucket[b][0] += len(toks)
            per_bucket[b][1] += nt
        for b in sorted(per_bucket):
            n_tok, new_t = per_bucket[b]
            if n_tok == 0:
                continue  # token-less buckets are absent from the output
            cum_tok += n_tok
            cum_typ += new_t
            exp[(g, b)] = (n_tok, new_t, cum_tok, cum_typ)

    got = {
        (r.source, r.bucket): (r.n_tokens, r.new_types, r.cum_tokens, r.cum_types)
        for r in vocab_growth(df, "source", "doc_id", "text", 10).collect()
    }
    assert got == exp

    import pytest as _pt

    with _pt.raises(ValueError):
        vocab_growth(df, "source", "doc_id", "text", 0)


def test_zipf_slope_vs_numpy(spark):
    """Quantized-log least-squares slope must equal an independent numpy
    replay (same micro-int L), and a Zipfy synthetic corpus must come out
    clearly steeper than a uniform one. Margin to the micro-int rounding
    boundary is asserted so the cross-engine round can't flip."""
    import math

    import numpy as np

    from mtsad_spark.functions.text import zipf_slope

    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(300)]
    # zipfy: P(rank r) ~ 1/r ; uniform: equal
    zp = 1.0 / np.arange(1, 301)
    zp /= zp.sum()
    rows = []
    for _ in range(400):
        zw = rng.choice(words, size=50, p=zp)
        uw = rng.choice(words, size=50)
        rows.append(("zipfy", " ".join(zw)))
        rows.append(("uniform", " ".join(uw)))
    df = spark.createDataFrame(rows, "source string, text string")
    got = zipf_slope(df, "source", "text", top_k=200).toPandas().set_index("source")

    def py_slope(texts, k):
        from collections import Counter

        c = Counter(t for s in texts for t in s.split() if t)
        top = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:k]
        L = lambda v: round(math.log(v) * 1e6)
        xs = [L(r + 1) for r in range(len(top))]
        ys = [L(cnt) for _, cnt in top]
        # margin: no 1e6*ln value may sit near a .5 rounding boundary
        for v in {r + 1 for r in range(len(top))} | {cnt for _, cnt in top}:
            frac = abs((math.log(v) * 1e6) % 1 - 0.5)
            assert frac > 1e-4, f"rounding-boundary margin too small for {v}"
        m = len(xs)
        num = m * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        den = m * sum(x * x for x in xs) - sum(xs) ** 2
        # match the engines' float association: DECIMAL→double casts on
        # num and den SEPARATELY, then one double division (int/int in
        # python is single-rounded and can differ by 1 ulp)
        return m, float(num) / float(den)

    for src in ("zipfy", "uniform"):
        texts = [t for s, t in rows if s == src]
        m, sl = py_slope(texts, 200)
        assert got.loc[src, "n_terms"] == m
        assert got.loc[src, "slope"] == sl, src
    assert got.loc["zipfy", "slope"] < got.loc["uniform", "slope"] - 0.3


def test_bigram_conditional_entropy_vs_python(spark):
    """H(next|cur) must equal the quantized-log python replay; a repetitive
    stream must score (near) zero and a diverse one strictly higher."""
    import math
    from collections import Counter

    import numpy as np

    from mtsad_spark.functions.text import bigram_conditional_entropy

    rng = np.random.default_rng(9)
    rows = []
    for i in range(50):
        rows.append(("loopy", [1, 2, 3, 4] * 10))  # fully deterministic chain
        rows.append(("mixed", [int(x) for x in rng.integers(0, 30, size=40)]))
    rows.append(("tiny", [7]))  # shorter than a bigram: contributes nothing
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    got = (
        bigram_conditional_entropy(df, "source", "tokens")
        .toPandas()
        .set_index("source")
    )
    assert "tiny" not in got.index

    def py_h(seqs):
        cab = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                cab[(a, b)] += 1
        ca = Counter()
        for (a, _), c in cab.items():
            ca[a] += c
        N = sum(cab.values())
        L = lambda v: round(math.log(v) * 1e6)
        t = sum(c * (L(ca[a]) - L(c)) for (a, _), c in cab.items())
        return N, len(ca), t / (N * 1e6)

    for src in ("loopy", "mixed"):
        seqs = [t for s, t in rows if s == src]
        n, vc, h = py_h(seqs)
        assert got.loc[src, "n_bigrams"] == n
        assert got.loc[src, "vocab_cur"] == vc
        assert got.loc[src, "cond_entropy_nats"] == h, src
    assert got.loc["loopy", "cond_entropy_nats"] == 0.0
    assert got.loc["mixed", "cond_entropy_nats"] > 1.0


def test_source_ngram_jaccard_vs_python_sets(spark):
    """Pairwise distinct-gram Jaccard must equal python set algebra, for
    overlapping and disjoint sources, emitting each unordered pair once."""
    from mtsad_spark.operators.dedup import source_ngram_jaccard

    seqs = {
        "a": [[1, 2, 3, 4], [2, 3, 4, 5]],
        "b": [[2, 3, 4], [9, 9, 9]],
        "c": [[100, 200], [300]],  # [300] too short for a bigram
    }
    rows = [(s, toks) for s, lst in seqs.items() for toks in lst]
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    got = {
        (r.group_a, r.group_b): r
        for r in source_ngram_jaccard(df, "source", "tokens", n=2).collect()
    }

    def py_grams(lst):
        return {
            tuple(s[i : i + 2]) for s in lst for i in range(len(s) - 1)
        }

    g = {k: py_grams(v) for k, v in seqs.items()}
    import itertools

    for x, y in itertools.combinations(sorted(seqs), 2):
        inter = len(g[x] & g[y])
        if inter == 0:
            assert (x, y) not in got  # no shared grams -> no row (inner join)
            continue
        r = got[(x, y)]
        assert r.n_a == len(g[x]) and r.n_b == len(g[y]) and r.n_inter == inter
        assert r.jaccard == inter / len(g[x] | g[y])
    assert ("a", "b") in got and got[("a", "b")].n_inter == 2


def test_bigram_pmi_vs_python(spark):
    """Division-free quantized PMI: pmi_micro must equal the python replay,
    a planted collocation must rank first, and min_count must prune hapax
    pairs that would otherwise dominate."""
    import math
    from collections import Counter

    import numpy as np

    from mtsad_spark.functions.text import bigram_pmi

    rng = np.random.default_rng(23)
    rows = []
    for _ in range(200):
        toks = [int(x) for x in rng.integers(0, 40, size=30)]
        # plant the collocation (7 -> 8) at two fixed positions
        toks[4:6] = [7, 8]
        toks[20:22] = [7, 8]
        rows.append(("s", toks))
        rows.append(("t", [1, 2] * 15))
    df = spark.createDataFrame(rows, "source string, tokens array<int>")
    got = (
        bigram_pmi(df, "source", "tokens", min_count=5, top_k=10)
        .toPandas()
        .sort_values(["source", "rank"])
    )

    def py_pmi(seqs):
        cab = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                cab[(a, b)] += 1
        ca, cb = Counter(), Counter()
        for (a, b), c in cab.items():
            ca[a] += c
            cb[b] += c
        N = sum(cab.values())
        L = lambda v: round(math.log(v) * 1e6)
        out = {
            (a, b): L(c) + L(N) - L(ca[a]) - L(cb[b])
            for (a, b), c in cab.items()
            if c >= 5
        }
        return cab, out

    s_rows = got[got.source == "s"]
    cab, pmi = py_pmi([t for src, t in rows if src == "s"])
    want = sorted(pmi.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(s_rows.a, s_rows.b)) == [k for k, _ in want]
    assert list(s_rows.pmi_micro) == [v for _, v in want]
    assert (s_rows.iloc[0].a, s_rows.iloc[0].b) == (7, 8), "planted collocation first"
    assert (s_rows.c_ab >= 5).all()
    for r in s_rows.itertuples():
        assert r.pmi_nats == r.pmi_micro / 1e6
    # the deterministic alternation: both (1,2) and (2,1) are certain pairs
    t_rows = got[got.source == "t"]
    assert set(zip(t_rows.a, t_rows.b)) == {(1, 2), (2, 1)}


def test_token_novelty_and_bucket_entropy_vs_python(spark):
    """First-occurrence novelty per time bucket and per-bucket quantized
    entropy must equal python replays; a bucket of one repeated token has
    zero entropy; the first bucket is 100% novel."""
    import datetime as dt
    import math
    from collections import Counter

    from mtsad_spark.functions.text import token_bucket_entropy, token_novelty

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("d0", t0 + dt.timedelta(seconds=10), [1, 2, 3]),
        ("d1", t0 + dt.timedelta(seconds=800), [2, 3, 4]),
        ("d2", t0 + dt.timedelta(seconds=950), [1, 5]),       # bucket 1: novel {5}
        ("d3", t0 + dt.timedelta(seconds=1900), [7, 7, 7, 7]),  # bucket 2: constant
    ]
    df = spark.createDataFrame(rows, "doc_id string, ts timestamp, tokens array<int>")
    nov = token_novelty(df, "ts", "tokens", 900).toPandas().sort_values("bucket_ts")
    assert list(nov.n_tokens) == [6, 2, 4]
    assert list(nov.n_distinct) == [4, 2, 1]
    assert list(nov.n_novel) == [4, 1, 1]  # {1,2,3,4}; {5}; {7}
    assert list(nov.novelty_rate) == [1.0, 0.5, 1.0]

    ent = token_bucket_entropy(df, "ts", "tokens", 900).toPandas().sort_values("bucket_ts")
    L = lambda v: round(math.log(v) * 1e6)

    def py_h(toks):
        c = Counter(toks)
        n = sum(c.values())
        return (n * L(n) - sum(v * L(v) for v in c.values())) / (n * 1e6)

    b0 = [1, 2, 3, 2, 3, 4]
    assert ent.entropy_nats.iloc[0] == py_h(b0)
    assert ent.entropy_nats.iloc[1] == py_h([1, 5])
    assert ent.entropy_nats.iloc[2] == 0.0  # constant bucket
    assert list(ent.n_distinct) == [4, 2, 1]
