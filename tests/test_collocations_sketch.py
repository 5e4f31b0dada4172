"""Round-5 operator tests: PMI collocations, bigram LM scoring,
count-min sketch, weighted sampling, keep-best dedup, dimension
standardization — each checked against an independent pure-python
twin (plus the DuckDB oracles in the catalog)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators.collocations import (
    bigram_lm_scores,
    pmi_pairs,
)
from databridge_etl_tools_spark.operators.dedup import keep_best
from databridge_etl_tools_spark.operators.quantize import standardize_dims
from databridge_etl_tools_spark.operators.sampling import sample_weighted
from databridge_etl_tools_spark.operators.sketch import countmin_topk

CORPUS = [
    (0, "new york is a big city"),
    (1, "new york has new people"),
    (2, "big city big lights"),
    (3, "new york new york new york"),
    (4, ""),
    (5, "solo"),
]


def _docs(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pmi_pairs_matches_python_twin(spark):
    df = pmi_pairs(_docs(spark), min_pair_count=2, top_k=5)
    got = {(r["a"], r["b"]): (r["c_ab"], r["score"]) for r in df.collect()}

    toks = [t.split() for _, t in CORPUS if t]
    uni = Counter(t for ts in toks for t in ts)
    pairs = Counter((ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1))
    n_tok = sum(uni.values())
    n_pair = sum(max(len(ts) - 1, 0) for ts in toks)
    exp = {}
    for (a, b), c in pairs.items():
        if c >= 2:
            exp[(a, b)] = (c, float(c) * n_tok * n_tok / (float(n_pair) * uni[a] * uni[b]))
    top = sorted(exp.items(), key=lambda kv: (-kv[1][1], kv[0]))[:5]
    assert got == dict(top)
    # "new york" must rank as a collocation
    assert ("new", "york") in got


def test_bigram_lm_score_matches_python_twin(spark):
    df = bigram_lm_scores(_docs(spark))
    got = {r["doc_id"]: (r["n_trans"], r["score_nano"]) for r in df.collect()}

    toks = {i: t.split() for i, t in CORPUS}
    grams = Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    )
    ctx = Counter()
    for (a, _), c in grams.items():
        ctx[a] += c
    v = len({t for ts in toks.values() for t in ts})
    exp = {}
    for i, ts in toks.items():
        trans = [(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        if not trans:
            continue  # <2-token docs are absent by contract
        s = sum(
            math.floor((grams[p] + 1) / (ctx[p[0]] + v) * 1e9) for p in trans
        )
        exp[i] = (len(trans), s)
    assert got == exp
    assert 4 not in got and 5 not in got
    # doc 3 repeats one transition — its mean p should be the highest
    mean = {i: s / n / 1e9 for i, (n, s) in got.items()}
    assert max(mean, key=mean.get) == 3


def test_countmin_estimate_dominates_exact(spark, sf_dir):
    from databridge_etl_tools_spark.registry import table

    docs = table(spark, sf_dir, "documents")
    out = countmin_topk(docs, lanes=4, width=1024, top_k=20).collect()
    assert len(out) == 20
    for r in out:
        assert r["cms_est"] >= r["exact_n"]  # one-sided error
        assert r["overest"] == r["cms_est"] - r["exact_n"]
    # with 1024 buckets and a tiny vocabulary, the head should be
    # nearly collision-free
    assert min(r["overest"] for r in out) == 0


def test_countmin_narrow_width_inflates_only_estimates(spark):
    rows = [(i, "alpha beta gamma delta " * (i + 1)) for i in range(8)]
    wide = countmin_topk(_docs(spark, rows), width=4096, top_k=4).collect()
    narrow = countmin_topk(_docs(spark, rows), width=2, top_k=4).collect()
    exact = {r["token"]: r["exact_n"] for r in wide}
    assert exact == {r["token"]: r["exact_n"] for r in narrow}  # truth unmoved
    # 2 buckets × 4 tokens must collide: total overestimate strictly grows
    assert sum(r["overest"] for r in narrow) > sum(r["overest"] for r in wide)


def _hash32(salt: str, key) -> int:
    return int(hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8], 16)


def test_sample_weighted_matches_hash_contract(spark):
    rows = [(i, (i % 10) + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    kept = {r["doc_id"] for r in sample_weighted(df, "w", "doc_id").collect()}
    exp = {
        i for i, w in rows if _hash32("wsample", i) * 10 < w * (1 << 32)
    }
    assert kept == exp
    # weight-10 rows keep ~100%, weight-1 rows ~10%
    w10 = sum(1 for i in kept if rows[i][1] == 10)
    w1 = sum(1 for i in kept if rows[i][1] == 1)
    assert w10 == 20 and w1 < 10


def test_keep_best_elects_longest_member(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 5)], "doc_id bigint, n_chars bigint"
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "doc_a bigint, doc_b bigint")
    out = {r["component"]: r for r in keep_best(docs, edges).collect()}
    assert set(out) == {1, 7}
    big = out[1]
    # quality tie between 2 and 3 at 30 chars → smallest id wins
    assert big["canonical_doc"] == 2
    assert big["n_members"] == 3 and big["best_quality"] == 30
    assert out[7]["canonical_doc"] == 7 and out[7]["n_members"] == 1


def test_standardize_dims_matches_numpy_twin(spark, sf_dir):
    import numpy as np

    from databridge_etl_tools_spark.registry import table

    emb = table(spark, sf_dir, "embeddings")
    got = {r["pos"]: r for r in standardize_dims(emb).collect()}
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64
    )
    xi = np.floor(mat * 10_000)
    n = mat.shape[0]
    assert set(got) == set(range(mat.shape[1]))
    for pos in (0, 17, 63):
        s, ss = xi[:, pos].sum(), (xi[:, pos] ** 2).sum()
        mean = s / n / 10_000
        var = (n * ss - s * s) / (n * (n - 1)) / 1e8
        r = got[pos]
        assert r["n"] == n
        assert abs(r["mean"] - mean) < 1e-12
        assert abs(r["var"] - var) < 1e-12
        outl = int((np.abs(mat[:, pos] - r["mean"]) > 3.0 * math.sqrt(r["var"])).sum())
        assert r["n_outliers"] == outl


def test_gram_doc_frequency_matches_python_twin(spark):
    from databridge_etl_tools_spark.operators.dedup import gram_doc_frequency

    rows = [
        (0, "a b c d"),        # grams: abc bcd
        (1, "a b c"),          # abc
        (2, "x y"),            # too short — no grams
        (3, "a b c a b c"),    # abc bca cab (distinct within doc)
    ]
    got = {r["gram"]: r["df"] for r in gram_doc_frequency(_docs(spark, rows)).collect()}
    exp = Counter()
    for _, t in rows:
        ts = t.split()
        grams = {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
        for g in grams:
            exp[g] += 1
    assert got == dict(exp)
    assert got["a b c"] == 3  # shared across docs 0, 1, 3

def test_sample_weighted_survives_huge_weights(spark):
    """The accept test runs in DECIMAL(38,0): with max(weight) > 2^31
    an int64 product h·w_max wraps under non-ANSI arithmetic and
    FLIPS keep/drop decisions (advisor finding r5). Pin the decision
    against the exact-integer python twin at 1e9-fixed-point-scale
    weights, where the int64 product would overflow for most rows."""
    rows = [(i, (i + 1) * 10**9) for i in range(64)]  # up to 6.4e10 > 2^31
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    kept = {r["doc_id"] for r in sample_weighted(df, "w", "doc_id").collect()}
    wmax = max(w for _, w in rows)
    exp = {i for i, w in rows if _hash32("wsample", i) * wmax < w * (1 << 32)}
    assert kept == exp
    assert rows[-1][0] in kept  # w == w_max keeps with probability 1
    assert 0 < len(kept) < len(rows)


def test_bigram_lm_cross_model_unseen_smoothing(spark):
    """Cross-model scoring (train_docs=) must smooth transitions the
    target LM never saw to floor(1e9/(c_a+V)) — LEFT-join semantics —
    and reproduce self-training exactly when train_docs is the corpus."""
    from databridge_etl_tools_spark.operators.collocations import bigram_lm_scores

    train = spark.createDataFrame([(1, "a b a b")], "doc_id bigint, text string")
    score = spark.createDataFrame([(9, "a b"), (10, "x y")], "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_trans"], r["score_nano"])
        for r in bigram_lm_scores(score, train_docs=train).collect()
    }
    # train LM: transitions a→b (c=2), b→a (c=1); c_a·: a=2, b=1; V=2
    # doc 9: a→b seen → p=(2+1)/(2+2)=0.75
    assert got[9] == (1, int(0.75 * 1e9))
    # doc 10: x→y fully unseen → p=(0+1)/(0+2)=0.5
    assert got[10] == (1, int(0.5 * 1e9))
    # self-training path unchanged: same as train_docs=itself
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b a c a")], "doc_id bigint, text string"
    )
    self_scores = {tuple(r) for r in bigram_lm_scores(docs).collect()}
    explicit = {tuple(r) for r in bigram_lm_scores(docs, train_docs=docs).collect()}
    assert self_scores == explicit


def test_dsir_selection_tilts_toward_target(spark, sf_dir):
    """The importance-resampled keep-set must up-weight the target
    slice: en documents' keep RATE must exceed the non-en rate."""
    from databridge_etl_tools_spark.queries.textops import dsir_importance_select
    import pyspark.sql.functions as F

    rep = {r["lang"]: r["n_kept"] for r in dsir_importance_select(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    en_rate = rep.get("en", 0) / totals["en"]
    other_kept = sum(v for k, v in rep.items() if k != "en")
    other_total = sum(v for k, v in totals.items() if k != "en")
    assert en_rate > other_kept / other_total


def test_dsir_weight_ratio_survives_int64_overflow(spark):
    """The w_ppm likelihood ratio must be computed in DECIMAL(38,0):
    s_tgt·10⁶ exceeds int64 once s_tgt > ~9.2e12 (docs with >~9,200
    transitions at nano fixed point), which wraps under non-ANSI
    arithmetic and throws under ANSI (advisor r6). Pin the exact
    decimal quotient at a magnitude where the bigint product fails."""
    s_tgt, s_raw = 9_300_000_000_000, 7  # s_tgt * 1e6 = 9.3e18 > 2^63-1
    df = spark.createDataFrame([(s_tgt, s_raw)], "s_tgt bigint, s_raw bigint")
    got = df.select(
        F.expr(
            "CAST(CAST(s_tgt AS DECIMAL(38,0)) * 1000000 DIV s_raw AS BIGINT)"
        ).alias("w_ppm")
    ).collect()[0]["w_ppm"]
    assert got == (s_tgt * 1_000_000) // s_raw  # python int = exact twin


def test_skipgram_pmi_matches_python_twin(spark):
    """Windowed pair counts, freq weighting, rational score and the
    (score desc, a, b) tie-break vs a brute-force python twin."""
    from collections import Counter

    from databridge_etl_tools_spark.operators.collocations import skipgram_pmi_pairs

    texts = [
        "a b c a b c d",
        "b c d e a b",
        "c d a b a b",
        "e e e a b c",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    W = 2
    pc, uni, n_tok, n_pair = Counter(), Counter(), 0, 0
    for t in texts:
        toks = t.split()
        n_tok += len(toks)
        uni.update(toks)
        for k in range(1, W + 1):
            for i in range(len(toks) - k):
                pc[(toks[i], toks[i + k])] += 1
                n_pair += 1
    scored = [
        (c * n_tok * n_tok / (n_pair * uni[a] * uni[b]), a, b, c)
        for (a, b), c in pc.items()
        if c >= 2
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    exp = [
        (r + 1, a, b, c, uni[a], uni[b], s)
        for r, (s, a, b, c) in enumerate(scored[:5])
    ]
    got = [
        tuple(r)
        for r in skipgram_pmi_pairs(
            docs, window=W, min_pair_count=2, top_k=5
        ).collect()
    ]
    assert got == exp
