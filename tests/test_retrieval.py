"""BM25 retrieval: pure-python twin (both idf variants), ranking
contract, and plan shape (broadcast vocabulary filter, no cartesian
products beyond the 1-row stats relation)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from databridge_etl_tools_spark.operators.retrieval import bm25_scores, bm25_topk

QUERIES = [
    ("q_join", "hash merge join"),
    ("q_scan", "table scan fast"),
]


def _py_bm25(docs, queries, k1=1.5, b=0.75, idf="rational"):
    """Independent python twin: per-(query, doc) BM25 over whitespace
    tokens, float accumulation in sorted-term order."""
    toks = {d: [t for t in re.split(r"\s+", txt.strip()) if t] for d, txt in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = Counter()
    for ts in toks.values():
        for t in set(ts):
            dfreq[t] += 1
    out = {}
    for qid, qtext in queries:
        qts = sorted(set(qtext.split()))
        for d, ts in toks.items():
            tf = Counter(ts)
            score, hits = 0.0, 0
            for t in qts:
                if tf[t] == 0:
                    continue
                hits += 1
                rational = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
                w = math.log(1.0 + rational) if idf == "ln" else rational
                score += (
                    w
                    * (tf[t] * (k1 + 1.0))
                    / (tf[t] + k1 * (1.0 - b + b * len(ts) / avgdl))
                )
            if hits:
                out[(qid, d)] = (score, hits)
    return out


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in df.collect()]
    qdf = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    return df, qdf, rows


@pytest.mark.parametrize("idf", ["rational", "ln"])
def test_bm25_matches_python_twin(corpus, idf):
    df, qdf, rows = corpus
    got = {
        (r.query_id, r.doc_id): (r.score, r.n_terms)
        for r in bm25_scores(df, qdf, idf=idf).collect()
    }
    want = _py_bm25(rows, QUERIES, idf=idf)
    assert set(got) == set(want)
    for key, (score, hits) in want.items():
        g_score, g_hits = got[key]
        assert g_hits == hits
        # decimal(38,12) accumulation vs float accumulation: equal to
        # well past the accumulator's truncation scale
        assert g_score == pytest.approx(score, abs=1e-9), key


def test_bm25_topk_ranking_contract(corpus):
    df, qdf, rows = corpus
    top = bm25_topk(df, qdf, k=5).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append(r)
    want = _py_bm25(rows, QUERIES)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # ranks descend by score with doc_id tiebreak — mirror on the twin
        twin = sorted(
            ((s, d) for (q, d), (s, h) in want.items() if q == qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        assert [r.doc_id for r in rs] == [d for _, d in twin]


def test_bm25_plan_filters_before_tf_shuffle(corpus):
    """The corpus-sized tf aggregation must consume a token stream
    already joined against the broadcast query vocabulary — the plan
    carries a BroadcastHashJoin below the first HashAggregate and no
    CartesianProduct (the 1-row stats crossJoin becomes a broadcast
    nested loop over one row)."""
    df, qdf, _ = corpus
    plan = bm25_scores(df, qdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_unknown_idf_rejected(corpus):
    df, qdf, _ = corpus
    with pytest.raises(ValueError):
        bm25_scores(df, qdf, idf="bm25L")


def test_ranking_eval_known_values(spark):
    """Hand-computed metrics on a 3-query fixture: first-hit ranks
    1, 3, none -> MRR = (1 + 1/3 + 0)/3; R-capped recall and
    precision likewise (q30 trunc is the only rounding)."""
    from databridge_etl_tools_spark.operators.retrieval import ranking_eval

    results = spark.createDataFrame(
        [(q, i, r) for q, items in {
            1: [(10, 1), (11, 2), (12, 3)],
            2: [(20, 1), (21, 2), (22, 3)],
            3: [(30, 1), (31, 2), (32, 3)],
        }.items() for i, r in items],
        "query_id long, neighbor_id long, rank int",
    )
    truth = spark.createDataFrame(
        # q1: relevant {10, 12} (hits at ranks 1 and 3)
        # q2: relevant {22, 99} (hit at rank 3; 99 unreachable)
        # q3: relevant {77} (no hit)
        [(1, 10), (1, 12), (2, 22), (2, 99), (3, 77)],
        "query_id long, neighbor_id long",
    )
    r = ranking_eval(results, truth, k=3).first()
    assert r["n_queries"] == 3
    q30 = 1 << 30
    exp_mrr = (q30 // 1 + q30 // 3 + 0) / 3 / q30
    assert r["mrr"] == exp_mrr
    # recall: q1 2/min(2,3)=1, q2 1/min(2,3) -> q30//2, q3 0/1 -> 0
    exp_recall = (q30 + (1 * q30) // 2 + 0) / 3 / q30
    assert r["recall_at_3"] == exp_recall
    assert r["precision_at_3"] == (2 + 1 + 0) / 3 / 3


def test_ranking_eval_labeled_equals_expanded(spark):
    """ranking_eval_labeled (histogram + result-side label probe)
    must produce EXACTLY the metrics of ranking_eval on the expanded
    same-label truth — including on a skewed-label corpus where the
    expansion the labeled path avoids would dominate."""
    from databridge_etl_tools_spark.operators.retrieval import (
        ranking_eval,
        ranking_eval_labeled,
    )

    # 40 items, heavily skewed labels: label 0 has 30 members
    items = [(i, 0 if i < 30 else i % 5 + 1) for i in range(40)]
    emb = spark.createDataFrame(items, "vec_id long, label long")
    # 4 queries with deterministic fake top-3 results (self excluded)
    results = spark.createDataFrame(
        [
            (0, 1, 1), (0, 35, 2), (0, 2, 3),      # q0 label 0
            (5, 31, 1), (5, 6, 2), (5, 99, 3),     # q5 label 0 (99: no label)
            (31, 36, 2), (31, 30, 1), (31, 7, 3),  # q31 label 2
            (33, 33, 1), (33, 34, 2), (33, 38, 3), # q33 label 4; self in results
        ],
        "query_id long, neighbor_id long, rank int",
    )
    lab = {i: l for i, l in items}
    truth = spark.createDataFrame(
        [
            (q, i)
            for q in (0, 5, 31, 33)
            for i, l in items
            if l == lab[q] and i != q
        ],
        "query_id long, neighbor_id long",
    )
    a = ranking_eval(results, truth, k=3).first()
    b = ranking_eval_labeled(results, emb, k=3).first()
    assert a.asDict() == b.asDict()
    assert a["n_queries"] == 4
