"""Unit tests for dedup + similarity operators on planted cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.operators import dedup as DD
from databridge_etl_tools_spark.operators import similarity as SIM

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
    (4, "completely different words entirely here now today friend"),
    (5, "  The  quick brown fox jumps over the lazy dog "),  # ws/case-normalized dup
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_exact_duplicates(spark):
    out = DD.exact_duplicates(_docs(spark), "text", "doc_id").collect()
    by_rep = {r.representative: r.n_copies for r in out}
    assert by_rep[1] == 3  # 1, 2, and the normalized 5
    assert by_rep[3] == 1 and by_rep[4] == 1


def test_jaccard_pairs_finds_near_dup(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.jaccard_pairs(_docs(spark), "doc_id", "text", threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_jaccard_for_pairs_matches_full_join_on_given_pairs(spark):
    """The candidate-bounded exact side (r7, MinHash-audit scale fix)
    must reproduce the inverted-index jaccard EXACTLY on the supplied
    pairs — including a shingle-disjoint pair (0.0) and a pair whose
    doc has < n tokens (dropped, caller left-joins)."""
    docs = _docs(spark)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (3, 4)], "doc_a int, doc_b int"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.jaccard_for_pairs(docs, pairs, "doc_id", "text").collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.0).collect()
    }
    for p, j in got.items():
        if j > 0.0:
            assert j == full[p]
        else:
            assert p not in full  # disjoint pairs never materialize there
    assert got[(1, 2)] == 1.0 and 0.5 <= got[(1, 3)] < 1.0
    assert set(got) == {(1, 2), (1, 3), (1, 4), (3, 4)}


def test_jaccard_prefix_filter_path_is_exact(spark):
    """The AllPairs/PPJoin prefix-filtered plan returns EXACTLY the
    naive inverted-index pairs (same pairs, same jaccard values) —
    prefix filtering is a candidate-pruning strategy, not an
    approximation. Checked on the documents fixture plus a planted
    hot-shingle block shared by every doc (the case the prefix order
    is designed to defuse: the hot shingle lands in suffixes)."""
    from pyspark.sql import functions as F

    docs = _docs(spark).withColumn(
        "text", F.concat(F.col("text"), F.lit(" common tail shingle here"))
    )
    for t in (0.3, 0.5, 0.8):
        naive = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in DD.jaccard_pairs(
                docs, "doc_id", "text", threshold=t, prefix_filter=False
            ).collect()
        }
        pref = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in DD.jaccard_pairs(
                docs, "doc_id", "text", threshold=t, prefix_filter=True
            ).collect()
        }
        assert naive == pref, f"paths diverge at threshold {t}"
        hashed = {
            (r.doc_a, r.doc_b): round(r.jaccard, 9)
            for r in DD.jaccard_pairs(
                docs,
                "doc_id",
                "text",
                threshold=t,
                prefix_filter=True,
                prefix_order="hash",
            ).collect()
        }
        assert naive == hashed, f"hash-order path diverges at threshold {t}"


def test_prefix_filter_integer_boundary_exact(spark):
    """ADVICE r3: when t·|A| is mathematically an exact integer, the
    float product can round above it, inflating ceil() by 1 and
    shortening the prefix — a pair at exactly J = t would be missed.
    Plant such a pair: |A| = |B| = 20 shingles, 11 common →
    J = 11/29 ≈ 0.379; and a crafted t = 0.55 with |A| = 20 where
    0.55 * 20 = 11.000000000000002 in float64. Use two docs with
    exactly J = t at that boundary."""
    from pyspark.sql import functions as F

    # 25 tokens -> 23 distinct trigram shingles per doc; overlap so
    # that J = inter/union hits an exact-integer t*n boundary.
    base = [f"w{i}" for i in range(25)]
    other = base[:14] + [f"z{i}" for i in range(11)]  # 12 shared shingles
    docs = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(other))], "doc_id int, text string"
    )
    n_a = 23
    inter = 12
    jac = inter / (n_a + n_a - inter)
    for t in (jac, 0.3, 0.35):
        naive = {
            (r.doc_a, r.doc_b)
            for r in DD.jaccard_pairs(
                docs, "doc_id", "text", threshold=t, prefix_filter=False
            ).collect()
        }
        for order in ("df", "hash"):
            pref = {
                (r.doc_a, r.doc_b)
                for r in DD.jaccard_pairs(
                    docs,
                    "doc_id",
                    "text",
                    threshold=t,
                    prefix_filter=True,
                    prefix_order=order,
                ).collect()
            }
            assert naive == pref, (t, order)
    assert (1, 2) in {
        (r.doc_a, r.doc_b)
        for r in DD.jaccard_pairs(
            docs, "doc_id", "text", threshold=jac, prefix_filter=True
        ).collect()
    }


def test_prefix_filter_hash_order_is_shuffle_lean(spark):
    """The md5-order prefix path computes prefixes array-side: its
    executed plan must carry strictly fewer exchanges than the
    df-order path (measured 1 vs 4 at sf0.001 — the hash path's only
    hash-exchange is the candidate join itself, reused across both
    sides of the self-join)."""

    docs = _docs(spark)

    def n_exchanges(order):
        out = DD.jaccard_pairs(
            docs, "doc_id", "text", threshold=0.5, prefix_filter=True,
            prefix_order=order,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    h, d = n_exchanges("hash"), n_exchanges("df")
    assert h < d, (h, d)


def test_containment_catches_embedded_doc(spark):
    """A short doc embedded verbatim in a long one: containment of
    the short side is 1.0 even though Jaccard is far below threshold
    — the contamination case symmetric dedup misses."""
    short = "alpha beta gamma delta epsilon zeta"
    long = (
        "one two three four five six seven eight nine ten "
        + short
        + " eleven twelve thirteen fourteen fifteen sixteen seventeen"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "unrelated words only here friend")],
        "doc_id int, text string",
    )
    out = {
        (r.doc_src, r.doc_dst): r.containment
        for r in DD.containment_pairs(
            docs, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert out[(1, 2)] == 1.0  # short fully contained in long
    assert (2, 1) not in out  # long not contained in short
    assert (1, 3) not in out
    jac = {
        (r.doc_a, r.doc_b)
        for r in DD.jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (1, 2) not in jac  # symmetric jaccard misses the embedding


def test_winnowing_guarantee_and_density(spark):
    """Winnowing contract: (a) two docs sharing a run of ≥ k+w-1
    tokens share ≥1 fingerprint; (b) fingerprints are a strict subset
    of the full k-gram hash set; (c) disjoint docs share none."""
    shared_run = "p q r s t u v w"  # 8 tokens ≥ k+w-1 = 6
    docs = spark.createDataFrame(
        [
            (1, "a b c d e " + shared_run),
            (2, shared_run + " x y z zz yy xx"),
            (3, "m n o mm nn oo pp qq rr ss"),
        ],
        "doc_id int, text string",
    )
    fp = {
        r.doc: set(r.fingerprints)
        for r in DD.winnow_fingerprints(docs, "doc_id", "text").collect()
    }
    assert fp[1] & fp[2], "shared run must yield a shared fingerprint"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])
    pairs = {
        (r.doc_a, r.doc_b): r.shared_fp
        for r in DD.winnow_overlap_pairs(
            docs, "doc_id", "text", min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) not in pairs
    # density: far fewer fingerprints than grams
    n_grams = len("a b c d e p q r s t u v w".split()) - 2
    assert len(fp[1]) < n_grams


def test_minhash_lsh_recovers_exact_dups(spark):
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in DD.minhash_lsh_pairs(_docs(spark), "doc_id", "text").collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical shingle sets → identical signatures
    assert all(0.0 <= v <= 1.0 for v in pairs.values())


def test_simhash_near_pairs(spark):
    sig = {
        r.doc: r.simhash
        for r in DD.simhash_signatures(_docs(spark), "doc_id", "text").collect()
    }
    assert sig[1] == sig[2]  # same token multiset
    ham_1_3 = bin(sig[1] ^ sig[3]).count("1")
    ham_1_4 = bin(sig[1] ^ sig[4]).count("1")
    assert ham_1_3 < ham_1_4  # near-dup closer than unrelated
    pairs = {
        (r.doc_a, r.doc_b)
        for r in DD.simhash_near_pairs(
            _docs(spark), "doc_id", "text", max_hamming=4, bands=5
        ).collect()
    }
    assert (1, 2) in pairs


VECS = [
    (1, [1.0, 0.0, 0.0, 0.0], 0),
    (2, [0.9, 0.1, 0.0, 0.0], 0),
    (3, [0.0, 1.0, 0.0, 0.0], 0),
    (4, [0.0, 0.0, 1.0, 0.0], 1),
    (5, [0.0, 0.1, 0.9, 0.0], 1),
]


def _emb(spark):
    return spark.createDataFrame(VECS, "vec_id int, embedding array<float>, label int")


def test_cosine_topk_orders_by_similarity(spark):
    out = SIM.cosine_topk(_emb(spark), k=2, query_pred=F.col("vec_id") == 1)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [2, 3]
    assert rows[0].cosine > 0.99


def test_cosine_topk_max_query_rows_guard(spark):
    """Self-mode over an oversized corpus must fail FAST with an
    actionable error (r6-verdict stretch), not submit an n²/C-pair
    join; a satisfied bound changes nothing."""
    emb = _emb(spark)
    with pytest.raises(ValueError, match="max_query_rows"):
        SIM.cosine_topk(emb, k=2, max_query_rows=3)
    ok = SIM.cosine_topk(emb, k=2, max_query_rows=5)
    assert ok.where(F.col("rank") == 1).count() == 5


def test_ivf_restricts_to_cell(spark):
    out = SIM.cosine_topk(
        _emb(spark), k=3, query_pred=F.col("vec_id") == 4, cell_col="label"
    ).collect()
    assert {r.neighbor_id for r in out} == {5}  # only same-label candidates


def test_ivf_multiprobe_recall_monotone_and_exact_at_full_probe(spark):
    """Multi-probe IVF: recall vs exact brute force is monotone in
    nprobe, and probing every cell reproduces the exact result —
    the correctness anchor for the (nprobe, recall) knob."""
    emb = _emb(spark)
    exact = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in SIM.cosine_topk(emb, k=2).collect()
    }
    by_probe = {}
    for nprobe in (1, 2):
        got = SIM.ivf_topk(emb, k=2, n_cells=2, iters=3, nprobe=nprobe).collect()
        by_probe[nprobe] = {(r.query_id, r.neighbor_id, r.rank) for r in got}
    r1 = len(by_probe[1] & exact)
    r2 = len(by_probe[2] & exact)
    assert r2 >= r1
    assert by_probe[2] == exact  # nprobe == n_cells probes everything


def test_neardup_pairs_threshold(spark):
    got = {(r.id_a, r.id_b) for r in SIM.neardup_pairs(_emb(spark), 0.95).collect()}
    assert got == {(1, 2), (4, 5)}


def test_neardup_pairs_no_cartesian_product(spark):
    plan = SIM.neardup_pairs(
        _emb(spark), 0.95
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_neardup_lsh_finds_production_threshold_pairs(spark):
    got = {
        (r.id_a, r.id_b)
        for r in SIM.neardup_pairs_lsh(_emb(spark), 0.95, dim=4).collect()
    }
    # candidate generation is banded LSH (recall<1 in general); on
    # these near-identical pairs the deterministic planes must agree
    assert got == {(1, 2), (4, 5)}


def test_vectorized_topk_matches_exact_within_cell(spark):
    exact = SIM.cosine_topk(
        _emb(spark), k=2, query_pred=F.col("vec_id") == 1, cell_col="label"
    )
    fast = SIM.cosine_topk_vectorized(
        _emb(spark), k=2, query_pred=F.col("vec_id") == 1, cell_col="label"
    )
    e = [(r.query_id, r.neighbor_id, r.rank) for r in exact.collect()]
    f = [(r.query_id, r.neighbor_id, r.rank) for r in fast.collect()]
    assert sorted(e) == sorted(f) and len(f) == 2


def test_vectorized_topk_builds_ivf_cells(spark):
    # default path: deterministic k-means cells; every query returns
    # its in-cell neighbors, nothing collected to the driver
    out = SIM.cosine_topk_vectorized(_emb(spark), k=1, n_cells=2, iters=2).collect()
    assert {r.query_id for r in out} <= {1, 2, 3, 4, 5}
    assert all(r.rank == 1 for r in out)


def test_interval_join_matches_naive(spark):
    from databridge_etl_tools_spark.operators.rangejoin import interval_join
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 20:02d} 12:00:00") for i in range(60)],
        "pid int, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    iv = spark.createDataFrame(
        [(1, "2024-01-03 00:00:00", "2024-01-06 00:00:00"),
         (2, "2024-01-05 12:00:00", "2024-01-05 13:00:00"),
         (3, "2024-02-01 00:00:00", "2024-02-02 00:00:00")],
        "iid int, s string, e string",
    ).select(
        "iid",
        F.col("s").cast("timestamp_ntz").alias("ts_start"),
        F.col("e").cast("timestamp_ntz").alias("ts_end"),
    )
    fast = {
        (r.pid, r.iid)
        for r in interval_join(pts, iv, "ts", "ts_start", "ts_end", width_minutes=720).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.crossJoin(iv)
        .where((F.col("ts") >= F.col("ts_start")) & (F.col("ts") < F.col("ts_end")))
        .collect()
    }
    assert fast == naive
    assert any(i == 2 for _, i in fast)  # boundary bucket interval matched
    assert not any(i == 3 for _, i in fast)  # disjoint interval empty

    # left outer: every point appears; unmatched points once with a
    # NULL interval; matched points exactly their inner-join rows
    left = interval_join(
        pts, iv, "ts", "ts_start", "ts_end", width_minutes=720, how="left"
    )
    lrows = {(r.pid, r.iid) for r in left.collect()}
    matched_pids = {p for p, _ in naive}
    expect = naive | {(p, None) for p, in pts.select("pid").collect() if p not in matched_pids}
    assert lrows == expect
    assert left.count() == len(expect)  # no duplicated unmatched rows
    # the outer plan stays hash-join-based: no nested-loop anywhere
    plan = left._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_lsh_multiprobe_improves_recall(spark):
    from databridge_etl_tools_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pred = F.col("vec_id") % 25 == 0
    truth = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, k=5, query_pred=pred).collect()
    }

    def recall(n_probes, n_planes=4):
        got = {
            (r.query_id, r.neighbor_id)
            for r in cosine_topk_lsh(
                emb, k=5, n_planes=n_planes, query_pred=pred, n_probes=n_probes
            ).collect()
        }
        return len(got & truth) / len(truth)

    # this corpus is LSH-adversarial (uniform random vectors: the true
    # top-5 sit at cosine ~0.4, i.e. ~66 degrees); measured recall at
    # 4 planes: ~0.09 single-probe vs ~0.44 probing all hamming-1
    # buckets — assert the mechanism, with head-room on the numbers
    r1, r5 = recall(1), recall(5)
    assert r5 >= r1  # multi-probe can only widen the candidate set
    assert r5 >= 0.25


def test_jaccard_hot_shingle_cap_keeps_planted_dups(spark):
    from databridge_etl_tools_spark.operators import dedup as DD2

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in DD2.jaccard_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in DD2.jaccard_pairs(
            docs, "doc_id", "text", threshold=0.8, max_shingle_df=100
        ).collect()
    }
    # high-Jaccard planted dups survive a generous frequency cap
    assert uncapped  # planted near-dups exist in this data
    assert capped <= uncapped  # lower-bound property: no new pairs
    assert len(capped) >= len(uncapped) * 0.8


def test_kmeans_ivf_build_and_probe(spark):
    from databridge_etl_tools_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        kmeans_fit,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, assignments = kmeans_fit(emb, k=8, iters=4)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)
    cells = {r.cell for r in assignments.collect()}
    assert cells <= set(range(8)) and len(cells) >= 2  # non-degenerate

    # determinism: a second fit produces identical assignments
    _, again = kmeans_fit(emb, k=8, iters=4)
    a = {r.vec_id: r.cell for r in assignments.collect()}
    b = {r.vec_id: r.cell for r in again.collect()}
    assert a == b

    indexed = ivf_build(emb, k=8, iters=4)
    probe = cosine_topk(
        indexed, k=5, query_pred=F.col("vec_id") % 50 == 0, cell_col="cell"
    )
    rows = probe.collect()
    assert len(rows) > 0
    # IVF recall vs brute force: same-cell vectors are the similar
    # ones by construction, so recall should beat random bucketing
    truth = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, k=5, query_pred=F.col("vec_id") % 50 == 0).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.2, recall


def test_sampling_deterministic_and_append_stable(spark):
    """Content-hash sampling contract: a row's fate is independent of
    partitioning AND of what other rows exist (append-stability) —
    the properties rand()/df.sample() cannot give — and the split
    assignment never migrates a key between train and val."""
    from databridge_etl_tools_spark.operators import sampling as SP

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    kept1 = {r.k for r in SP.sample_deterministic(df, "k", 0.3).collect()}
    kept2 = {
        r.k for r in SP.sample_deterministic(df.repartition(17), "k", 0.3).collect()
    }
    assert kept1 == kept2
    assert 0.2 < len(kept1) / 2000 < 0.4

    grown = spark.range(0, 3000).select(F.col("id").alias("k"))
    kept3 = {r.k for r in SP.sample_deterministic(grown, "k", 0.3).collect()}
    assert {k for k in kept3 if k < 2000} == kept1  # appends never flip fates

    s1 = {(r.k, r.split) for r in SP.train_val_split(df, "k", 0.1).collect()}
    s2 = {(r.k, r.split) for r in SP.train_val_split(grown, "k", 0.1).collect()}
    assert s1 <= s2  # no key migrates between splits on rebuild
    n_val = sum(1 for _, s in s1 if s == "val")
    assert 0.05 < n_val / 2000 < 0.15

    strat = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(1000)], "k long, lang string"
    )
    kept = SP.stratified_sample(strat, "lang", {"de": 1.0, "en": 0.2}, key="k")
    by_lang = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang["de"] == 500  # rate 1.0 keeps every row
    assert 50 < by_lang["en"] < 150


def test_mixture_hits_weights_without_upsampling(spark):
    """Weighted corpus mixture: achieved proportions track the
    requested weights, no source is upsampled (rate caps at 1.0), the
    binding source limits the feasible total, and provenance rides a
    source tag."""
    from databridge_etl_tools_spark.operators import sampling as SP

    web = spark.range(0, 4000).select(F.col("id").alias("k"))
    code = spark.range(10_000, 10_400).select(F.col("id").alias("k"))  # small: binding
    mixed = SP.mixture({"web": (web, 0.8), "code": (code, 0.2)}, key="k")
    rep = {r.source: (r.n_rows, r.proportion) for r in SP.mixture_report(mixed).collect()}
    # code is the binding source: weight 0.2 over 400 rows caps the
    # mixture at ~2000 total; code is kept whole, web sampled to ~1600
    assert rep["code"][0] == 400
    assert 1300 < rep["web"][0] < 1900
    assert 0.72 < rep["web"][1] < 0.88
    # no duplicated rows ever (no upsampling)
    assert mixed.count() == mixed.select("k").distinct().count()
    # determinism: same inputs, same mixture
    again = SP.mixture({"web": (web, 0.8), "code": (code, 0.2)}, key="k")
    assert {r.k for r in mixed.collect()} == {r.k for r in again.collect()}


def test_mixture_rejects_degenerate_inputs(spark):
    """ADVICE r3: a positively-weighted empty source must raise (it
    would otherwise zero the feasibility min and silently empty the
    whole mixture); all-zero or negative weights must raise too."""
    import pytest

    from databridge_etl_tools_spark.operators import sampling as SP

    web = spark.range(0, 100).selectExpr("id AS k")
    empty = spark.range(0).selectExpr("id AS k")
    with pytest.raises(ValueError, match="zero rows"):
        SP.mixture({"web": (web, 0.8), "ghost": (empty, 0.2)}, key="k")
    with pytest.raises(ValueError, match="positive weight"):
        SP.mixture({"web": (web, 0.0), "more": (web, 0.0)}, key="k")
    with pytest.raises(ValueError, match="non-negative"):
        SP.mixture({"web": (web, -1.0), "more": (web, 2.0)}, key="k")
    # zero-weighted empty source is fine: it contributes nothing
    out = SP.mixture({"web": (web, 1.0), "ghost": (empty, 0.0)}, key="k")
    assert out.count() == 100


# ---- train/eval n-gram decontamination ------------------------------


def test_decontaminate_planted(spark):
    from databridge_etl_tools_spark.operators.dedup import decontaminate

    evd = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # embeds an eval 7-gram run inside a longer doc -> 2 hits
            # (7-grams starting at 'alpha' and at 'beta')
            (1, "intro words alpha beta gamma delta epsilon zeta eta theta end"),
            # same words but order broken -> clean
            (2, "beta alpha gamma delta epsilon zeta eta theta filler"),
            # too short for any 7-gram -> clean by construction
            (3, "alpha beta gamma"),
            (4, "completely unrelated text with many different words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate(train, evd, n=7).collect()}
    assert out[1].n_gram_hits == 2 and not out[1].clean
    assert out[2].clean and out[2].n_gram_hits == 0
    assert out[3].clean
    assert out[4].clean
    # duplicate occurrences of the same colliding gram count once
    dup = spark.createDataFrame(
        [(5,
          "alpha beta gamma delta epsilon zeta eta x "
          "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    r5 = decontaminate(dup, evd, n=7).first()
    assert r5.n_gram_hits == 1 and not r5.clean


def test_temperature_weights_and_mixture(spark):
    """mT5-style temperature smoothing: alpha=1 keeps natural
    proportions, alpha=0.5 lifts small sources above their natural
    share, and the mixture wired through precomputed counts matches
    recomputing them."""
    import math

    from databridge_etl_tools_spark.operators import sampling as SP

    w = SP.temperature_weights({"big": 900, "small": 100}, alpha=0.5)
    assert w == {"big": math.sqrt(900), "small": math.sqrt(100)}
    w1 = SP.temperature_weights({"big": 900, "small": 100}, alpha=1.0)
    assert w1["big"] / w1["small"] == pytest.approx(9.0)
    w0 = SP.temperature_weights({"big": 900, "small": 100}, alpha=0.0)
    assert w0["big"] == w0["small"] == 1.0
    with pytest.raises(ValueError):
        SP.temperature_weights({})
    with pytest.raises(ValueError):
        SP.temperature_weights({"a": -1})

    big = spark.range(0, 900).withColumnRenamed("id", "k")
    small = spark.range(10000, 10100).withColumnRenamed("id", "k")
    mixed = SP.temperature_mixture({"big": big, "small": small}, key="k", alpha=0.5)
    rep = {r.source: r.proportion for r in SP.mixture_report(mixed).collect()}
    # natural share of small = 0.1; sqrt-smoothed target = 10/40 = 0.25
    assert rep["small"] > 0.15
    assert rep["small"] == pytest.approx(0.25, abs=0.08)
    # rerun is identical (content-hash fates)
    again = SP.temperature_mixture({"big": big, "small": small}, key="k", alpha=0.5)
    assert sorted(r.k for r in mixed.collect()) == sorted(r.k for r in again.collect())
    with pytest.raises(ValueError):
        SP.mixture({"a": (big, 1.0)}, key="k", counts={"b": 3})


def test_cap_per_group_topn(spark):
    """Per-domain cap: at most n rows per group, ranked by the given
    total order; survivors are exactly the python twin's."""
    from pyspark.sql import functions as F

    from databridge_etl_tools_spark.operators import sampling as SP

    rows = [(g, i, (i * 37) % 11) for g in ("a", "b") for i in range(8)]
    df = spark.createDataFrame(rows, "g string, i long, score long")
    out = SP.cap_per_group(df, "g", 3, [F.desc("score"), F.asc("i")]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append((r.rank, r.i, r.score))
    for g in ("a", "b"):
        want = sorted(
            [(i, s) for gg, i, s in rows if gg == g], key=lambda t: (-t[1], t[0])
        )[:3]
        got = sorted(by_g[g])
        assert [(i, s) for _, i, s in got] == want
        assert [rk for rk, _, _ in got] == [1, 2, 3]
    with pytest.raises(ValueError):
        SP.cap_per_group(df, "g", 0, [F.asc("i")])


def test_knn_classify_planted_clusters(spark):
    """Two tight clusters: every query inherits its cluster's label;
    a query alone in its IVF cell keeps a NULL prediction instead of
    vanishing."""
    rows = []
    for i in range(6):  # cluster A around (1, 0, 0): label 1
        rows.append((i, [1.0, 0.01 * i, 0.0], 1, 0))
    for i in range(6, 12):  # cluster B around (0, 1, 0): label 2
        rows.append((i, [0.0, 1.0, 0.01 * i], 2, 0))
    rows.append((99, [0.0, 0.0, 1.0], 7, 5))  # lone cell
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int, cell int"
    )
    out = {
        r.query_id: r
        for r in SIM.knn_classify(
            emb, k=3, query_pred=F.col("vec_id").isin(0, 7, 99)
        ).collect()
    }
    assert out[0].pred_label == 1 and out[0].correct
    assert out[7].pred_label == 2 and out[7].correct
    # brute force: the lone vector's nearest neighbors are cluster B
    # (their small z-components give nonzero cosine with (0,0,1)), so
    # the vote mislabels it — and `correct` reports that honestly
    assert out[99].pred_label == 2 and out[99].correct is False
    cellwise = {
        r.query_id: r
        for r in SIM.knn_classify(
            emb, k=3, query_pred=F.col("vec_id").isin(0, 99), cell_col="cell"
        ).collect()
    }
    assert cellwise[0].pred_label == 1
    assert cellwise[99].pred_label is None and cellwise[99].correct is None


def test_kfold_split_contract(spark):
    """Folds land in [0, k), are deterministic, and a row's fold is
    unchanged by the presence of other rows (append stability)."""
    from databridge_etl_tools_spark.operators import sampling as SP

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    folds = {r.k: r.fold for r in SP.kfold_split(df, "k", k=5).collect()}
    assert set(folds.values()) <= set(range(5))
    # roughly balanced (md5 residue): each fold within 3x of uniform
    from collections import Counter

    c = Counter(folds.values())
    assert all(80 < c[f] < 400 for f in range(5))
    sub = {r.k: r.fold for r in SP.kfold_split(df.where("k < 100"), "k", k=5).collect()}
    assert all(folds[k] == v for k, v in sub.items())
    with pytest.raises(ValueError):
        SP.kfold_split(df, "k", k=1)


def test_asof_join_matches_pandas_merge_asof(spark):
    """Generic as-of join vs pandas.merge_asof: backward, forward,
    and tolerance semantics on randomized-but-fixed data."""
    import datetime as dt

    import pandas as pd

    from databridge_etl_tools_spark.operators.rangejoin import asof_join

    t0 = dt.datetime(2024, 1, 1)
    lrows, rrows = [], []
    for g in (1, 2):
        for i in range(20):
            lrows.append((g, t0 + dt.timedelta(minutes=(i * 37) % 120), i))
        for i in range(8):
            rrows.append(
                (g, t0 + dt.timedelta(minutes=(i * 53) % 120), float(g * 100 + i))
            )
    left = spark.createDataFrame(lrows, "g long, ts timestamp_ntz, seq long")
    right = spark.createDataFrame(rrows, "g long, ts timestamp_ntz, price double")

    lp = pd.DataFrame(lrows, columns=["g", "ts", "seq"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["g", "ts", "price"]).sort_values("ts")
    for direction, tol_us, tol_pd in [
        ("backward", None, None),
        ("forward", None, None),
        ("backward", 15 * 60 * 1_000_000, pd.Timedelta(minutes=15)),
    ]:
        got = {
            (r.g, r.seq): (r.asof_ts, r.price)
            for r in asof_join(
                left, right, "g", value_cols=["price"],
                direction=direction, tolerance_us=tol_us,
            ).collect()
        }
        want_df = pd.merge_asof(
            lp, rp, on="ts", by="g", direction=direction, tolerance=tol_pd
        )
        for _, row in want_df.iterrows():
            g_ts, g_price = got[(row.g, row.seq)]
            if pd.isna(row.price):
                assert g_price is None and g_ts is None, (direction, row.seq)
            else:
                assert g_price == row.price, (direction, row.seq)
    with pytest.raises(ValueError):
        asof_join(left, right, "g", direction="nearest")
    with pytest.raises(ValueError):
        asof_join(left.withColumnRenamed("seq", "price"), right, "g",
                  value_cols=["price"])


def test_asof_join_duplicate_right_keys_deterministic(spark):
    """Round-4 advisor item: when multiple right rows share one
    (by, right_on), the carried match is the GREATEST payload struct
    — a total order, so the result cannot depend on partitioning.
    Pinned across both directions and both partition layouts."""
    import datetime as dt

    from databridge_etl_tools_spark.operators.rangejoin import asof_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=10), 0)], "g long, ts timestamp_ntz, seq long"
    )
    rrows = [(1, t0, p) for p in (7.0, 3.0, 9.0, 1.0)]  # 4 dup-key rights
    for direction in ("backward", "forward"):
        for nparts in (1, 7):
            right = spark.createDataFrame(
                rrows, "g long, ts timestamp_ntz, price double"
            ).repartition(nparts)
            lf = left if direction == "backward" else spark.createDataFrame(
                [(1, t0 - dt.timedelta(minutes=10), 0)],
                "g long, ts timestamp_ntz, seq long",
            )
            out = asof_join(lf, right, "g", value_cols=["price"], direction=direction)
            rows = out.collect()
            assert len(rows) == 1
            # greatest (ts, price) struct wins → price 9.0
            assert rows[0]["price"] == 9.0, (direction, nparts)


def test_shared_spans_matches_python_twin(spark):
    """Diagonal run-length construction vs a brute-force python twin
    on planted verbatim overlaps (maximality, positions, lengths)."""
    from databridge_etl_tools_spark.operators.dedup import shared_spans

    rows = [
        (0, "a b c d e f g h"),          # shares d..h with 1 (5 tokens)
        (1, "x y d e f g h z"),
        (2, "a b c q r s t u v"),        # shares a b c with 0 (3 tokens)
        (3, "m n o p"),                  # no overlap
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"]): r["span_tokens"]
        for r in shared_spans(docs, n=2, min_len=3).collect()
    }

    # brute-force twin: all maximal common substrings (token level)
    toks = {i: t.split() for i, t in rows}
    exp = {}
    for a in toks:
        for b in toks:
            if a >= b:
                continue
            ta, tb = toks[a], toks[b]
            for i in range(len(ta)):
                for j in range(len(tb)):
                    if ta[i] != tb[j]:
                        continue
                    # maximal start only
                    if i > 0 and j > 0 and ta[i - 1] == tb[j - 1]:
                        continue
                    k = 0
                    while i + k < len(ta) and j + k < len(tb) and ta[i + k] == tb[j + k]:
                        k += 1
                    if k >= 3:
                        exp[(a, b, i, j)] = k
    assert got == exp
    assert got[(0, 1, 3, 2)] == 5   # "d e f g h"
    assert got[(0, 2, 0, 0)] == 3   # "a b c"


def test_remove_spans_cuts_lower_priority_copy(spark):
    from databridge_etl_tools_spark.operators.dedup import (
        remove_spans,
        shared_spans,
    )

    rows = [
        (0, "a b c d e f"),
        (1, "x y a b c d e f z"),   # shares a..f with 0 → cut from doc 1
        (2, ""),                     # empty doc passes through
        (3, "solo words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = shared_spans(docs, n=2, min_len=3)
    out = {r["doc_id"]: r for r in remove_spans(docs, spans).collect()}
    assert set(out) == {0, 1, 2, 3}
    # doc 0 (higher priority) keeps its text
    assert out[0]["text"] == "a b c d e f" and out[0]["n_removed"] == 0
    # doc 1 loses the 6 shared tokens, keeps the rest in order
    assert out[1]["text"] == "x y z"
    assert out[1]["n_removed"] == 6 and out[1]["n_tokens"] == 3
    assert out[2]["text"] == "" and out[2]["n_tokens"] == 0
    assert out[3]["n_removed"] == 0

def test_shared_spans_stop_gram_cap_bounds_join(spark):
    """A corpus-wide stop-gram must NOT reach the positional self-join
    when the df-cap is set (round-5 verdict item #1): with a 3-gram
    planted in EVERY document, the uncapped join output is quadratic
    in the corpus while the capped one sees only the genuine pair.
    The cap's maximality trade: the all-stop-gram span disappears;
    spans containing any under-cap gram still surface."""
    from databridge_etl_tools_spark.operators.dedup import shared_spans

    stop = "of the and"  # planted in all 40 docs
    rows = [(i, f"u{i} v{i} {stop} w{i}") for i in range(38)]
    # one genuine rare repeat between docs 38 and 39
    rows += [(38, f"{stop} p q r s t"), (39, f"zz {stop} p q r s t")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    capped = shared_spans(docs, n=3, min_len=4, max_gram_df=5)
    got = {(r["doc_a"], r["doc_b"]): r["span_tokens"] for r in capped.collect()}
    # only the genuine pair survives; the stop-gram spans are ceded.
    # The recovered span is "the and p q r s t" (7 tokens) — the
    # leading window "of the and" is itself over-cap, so the maximal
    # span shrinks by exactly the pruned prefix (the documented trade)
    assert got == {(38, 39): 7}

    # frac variant: 5/40 = 12.5% cap → same result
    frac = shared_spans(docs, n=3, min_len=4, max_gram_df_frac=0.125)
    got_f = {(r["doc_a"], r["doc_b"]): r["span_tokens"] for r in frac.collect()}
    assert got_f == got

    # uncapped control: the stop-gram alone creates C(40,2)=780 pairs
    uncapped = shared_spans(docs, n=3, min_len=3)
    assert uncapped.count() >= 780


def test_shared_spans_cap_keeps_undercap_grams_in_mixed_spans(spark):
    """A span that MIXES an over-cap gram with under-cap grams is
    still found as fragments: only the over-cap window is pruned, and
    the diagonal run splits around the pruned gap — the rare flanks
    both survive (nothing under-cap is lost, the second half of the
    documented maximality trade)."""
    from databridge_etl_tools_spark.operators.dedup import shared_spans

    # "c1 c2" is planted everywhere (over-cap at n=2); "a b" is rare
    rows = [(i, f"x{i} c1 c2 y{i}") for i in range(20)]
    rows += [(20, "a b c1 c2 d e"), (21, "q a b c1 c2 d e")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["start_a"], r["span_tokens"])
        for r in shared_spans(docs, n=2, min_len=3, max_gram_df=4).collect()
    )
    # pruning interior gram (c1,c2) splits the 6-token overlap into
    # two 3-token fragments: "a b c1" (via matches (a,b),(b,c1)) and
    # "c2 d e" (via (c2,d),(d,e)) — both flanks found, stop-core ceded
    assert got == [(20, 21, 0, 3), (20, 21, 3, 3)]


def test_internal_repeated_spans_tandem_and_echo(spark):
    """Planted self-repeats: a far echo yields one span at the echo
    shift; a tandem repeat ('x y z x y z x y z') yields overlapping-
    copy spans at the period shift."""
    from databridge_etl_tools_spark.operators.dedup import internal_repeated_spans

    rows = [
        # doc 1: 'alpha beta gamma delta' repeated after filler → echo
        (1, "alpha beta gamma delta epsilon one two three four five "
            "alpha beta gamma delta epsilon"),
        # doc 2: tandem period-3 repeat, 9 tokens
        (2, "x y z x y z x y z"),
        # doc 3: no repeats
        (3, "a b c d e f g h i j"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["start_a"], r["start_b"], r["shift"], r["span_tokens"])
        for r in internal_repeated_spans(docs, n=3, min_len=4).collect()
    }
    # doc 1: 5-token span 'alpha beta gamma delta epsilon' at 0 → 10
    assert (1, 0, 10, 10, 5) in got
    # doc 2: shift 3 tandem — positions 0..3 vs 3..6: run of grams
    # (0,3),(1,4),(2,5),(3,6) → span_tokens 4+2 = 6 starting at 0
    assert (2, 0, 3, 3, 6) in got
    # doc 3 clean
    assert not any(d == 3 for d, *_ in got)


def test_internal_spans_gram_occurrence_cap_bounds_pathological_doc(spark):
    """r6-verdict hazard: a single tandem-repeat document (one gram
    at every position) makes the (doc, gram) self-join quadratic in
    within-doc multiplicity — 10 k tokens of 'a' is ~5·10⁷ pairs in
    ONE join group. ``max_gram_occ`` must bound every position to the
    first cap occurrences (join ≤ cap²/2 pairs per (doc, gram)),
    still DETECT the stutter, and leave sub-cap documents byte-
    identical to the uncapped operator."""
    from databridge_etl_tools_spark.operators.dedup import internal_repeated_spans

    cap = 64
    pathological = (1, " ".join(["a"] * 10_000))
    normal = (2, "alpha beta gamma delta epsilon one two three four five "
                 "alpha beta gamma delta epsilon")
    docs = spark.createDataFrame([pathological, normal], "doc_id bigint, text string")
    got = internal_repeated_spans(docs, n=3, min_len=4, max_gram_occ=cap).collect()
    path = [r for r in got if r["doc_id"] == 1]
    # detected: the period-1 tandem shows up as shift-1 (and more) runs
    assert any(r["shift"] < r["span_tokens"] for r in path)
    # bounded: every surviving position came from the first `cap`
    # occurrences of the gram, so no span reaches past the cap window
    assert path and max(r["start_b"] for r in path) < cap
    assert len(path) <= cap  # at most one maximal run per realized shift
    # sub-cap documents are unaffected by the default cap
    uncapped = {
        tuple(r)
        for r in internal_repeated_spans(
            docs.where(F.col("doc_id") == 2), n=3, min_len=4, max_gram_occ=None
        ).collect()
    }
    capped = {tuple(r) for r in got if r[0] == 2}
    assert capped == uncapped and (2, 0, 10, 10, 5) in capped


def test_stratified_split_exact_counts_and_determinism(spark):
    """Exact-allocation split: per-stratum eval counts equal the
    Hamilton quotas exactly (not binomially), the total hits
    floor(N·num/den) exactly, quota-0 strata stay all-train, and the
    assignment is partition-invariant."""
    from databridge_etl_tools_spark.operators import sampling as SP

    # skewed strata: 700 / 250 / 49 / 1 rows
    rows = (
        [(i, "big") for i in range(700)]
        + [(700 + i, "mid") for i in range(250)]
        + [(950 + i, "small") for i in range(49)]
        + [(999, "tiny")]
    )
    df = spark.createDataFrame(rows, "k long, src string")
    quotas = SP.largest_remainder_quotas(
        {"big": 700, "mid": 250, "small": 49, "tiny": 1}, 1, 10
    )
    assert sum(quotas.values()) == 100  # floor(1000/10) exactly
    assert quotas["big"] == 70 and quotas["mid"] == 25
    assert quotas["small"] + quotas["tiny"] == 5  # remainders fill to budget

    out = SP.stratified_split_exact(df, "src", "k", frac=(1, 10))
    got = {
        (r.src): r.n
        for r in out.where(F.col("split") == "eval")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for s, q in quotas.items():
        assert got.get(s, 0) == q, (s, q, got)

    # partition-invariant: same fate for every row under a reshuffle
    out2 = SP.stratified_split_exact(df.repartition(13), "src", "k", frac=(1, 10))
    assert {(r.k, r.split) for r in out.collect()} == {
        (r.k, r.split) for r in out2.collect()
    }


def test_stratified_split_exact_strata_guard(spark):
    """The max_strata guard must fire with an actionable error BEFORE
    any unbounded driver collect (the kth_smallest_by max_groups
    discipline)."""
    from databridge_etl_tools_spark.operators import sampling as SP

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("src")
    )
    try:
        SP.stratified_split_exact(df, "src", "k", max_strata=100)
        raise AssertionError("expected ValueError from max_strata guard")
    except ValueError as e:
        assert "max_strata" in str(e) and "train_val_split" in str(e)


def test_tfidf_cosine_order_insensitive_and_boilerplate_immune(spark):
    """The two contracts that distinguish idf-cosine from shingles:
    (1) a token-reordered copy still pairs (cosine is a bag measure);
    (2) docs sharing ONLY corpus-common boilerplate never pair (the
    rational idf 2^10 // df zeroes terms with df > 1024, and common
    terms are excluded from candidate blocking anyway)."""
    from databridge_etl_tools_spark.operators.dedup import tfidf_cosine_pairs

    common = "the quick brown fox jumps over the lazy dog again"
    rows = [
        (1, "zebra quasar nebula plasma " + common),
        (2, common + " plasma nebula quasar zebra"),  # reordered copy
        (3, common + " unique1 unique2 unique3 unique4"),
        (4, common + " other5 other6 other7 other8"),
    ]
    # pad the corpus so 'common' words exceed max_df blocking
    rows += [(10 + i, common) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b)
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=(3, 5), max_df=8
        ).collect()
    }
    assert (1, 2) in pairs  # reordering cannot break the match
    # 3 and 4 share only the 44-df common words: never candidates
    assert not any({a, b} == {3, 4} for a, b in pairs)


def test_tfidf_cosine_threshold_is_exact_rational(spark):
    """Pairs on the threshold boundary resolve by exact integer
    arithmetic: identical rare-term docs have cosine exactly 1."""
    from databridge_etl_tools_spark.operators.dedup import tfidf_cosine_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    got = tfidf_cosine_pairs(df, "doc_id", "text", threshold=(1, 1)).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(1, 2)]
    assert got[0].cosine == 1.0


def test_kcenter_greedy_matches_python_replay(spark):
    """Farthest-point traversal: bit-exact vs a pure-python replay of
    the integer fixpoint (q20 quantization, exact squared L2, ties on
    lower id), and the geometric sanity check — on a cluster plus two
    far outliers, the outliers are picked before any second cluster
    member."""
    from databridge_etl_tools_spark.operators.similarity import kcenter_greedy

    vecs = {
        1: [0.0, 0.0], 2: [0.01, 0.0], 3: [0.0, 0.02], 4: [0.015, 0.01],
        10: [5.0, 5.0],   # far outlier A
        11: [-4.0, 6.0],  # far outlier B
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r["sel_round"], r["vec_id"], r["mind_q"])
        for r in kcenter_greedy(df, k=4)
        .orderBy("sel_round")
        .collect()
    ]

    # pure-python replay (float32 -> double is exact; q20 floor)
    import struct

    def q(v):
        return [
            int(
                float(struct.unpack("f", struct.pack("f", x))[0]) * (1 << 20)
                // 1
            )
            for x in v
        ]

    qv = {i: q(v) for i, v in vecs.items()}

    def d(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [min(qv)]
    want = [(0, chosen[0], 0)]
    mind = {i: d(qv[i], qv[chosen[0]]) for i in qv}
    for t in range(1, 4):
        nxt = max(qv, key=lambda i: (mind[i], -i))
        want.append((t, nxt, mind[nxt]))
        for i in qv:
            mind[i] = min(mind[i], d(qv[i], qv[nxt]))
    assert got == want
    # geometric: both outliers selected in rounds 1-2
    assert {got[1][1], got[2][1]} == {10, 11}


def test_kcenter_greedy_validation(spark):
    from databridge_etl_tools_spark.operators.similarity import kcenter_greedy

    import pytest

    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        kcenter_greedy(df, k=2)
    with pytest.raises(ValueError, match="k must"):
        kcenter_greedy(df, k=0)


def test_kcenter_random_vectors_match_python_replay(spark):
    """Property sweep: deterministic pseudo-random float vectors at
    several sizes/dims — the farthest-point traversal matches the
    pure-python integer replay exactly (ids, order, and distances)."""
    import struct

    from databridge_etl_tools_spark.operators.similarity import kcenter_greedy

    def f32(x):
        return float(struct.unpack("f", struct.pack("f", x))[0])

    for seed, n, dim, k in [(7, 25, 4, 5), (11, 40, 8, 6)]:
        x, vecs = seed, {}
        for i in range(n):
            v = []
            for _ in range(dim):
                x = (x * 1103515245 + 12345) % (1 << 31)
                v.append(f32((x % 2000 - 1000) / 250.0))
            vecs[i + 1] = v
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<float>",
        )
        got = [
            (r["sel_round"], r["vec_id"], r["mind_q"])
            for r in kcenter_greedy(df, k=k).orderBy("sel_round").collect()
        ]

        qv = {
            i: [int(f32(c) * (1 << 20) // 1) for c in v]
            for i, v in vecs.items()
        }

        def d(a, b):
            return sum((p - q) * (p - q) for p, q in zip(a, b))

        chosen0 = min(qv)
        want = [(0, chosen0, 0)]
        mind = {i: d(qv[i], qv[chosen0]) for i in qv}
        for t in range(1, k):
            nxt = max(qv, key=lambda i: (mind[i], -i))
            want.append((t, nxt, mind[nxt]))
            for i in qv:
                mind[i] = min(mind[i], d(qv[i], qv[nxt]))
        assert got == want, (seed, n, dim, k)
