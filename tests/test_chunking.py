"""Chunking + segment dedup: python twin over real docs, edge cases
(empty doc, short doc, stride > size), first-occurrence contract."""

from __future__ import annotations

import re

import pytest

from databridge_etl_tools_spark.operators.chunking import chunk_documents, dedup_segments


def _py_chunks(text, size, stride):
    toks = [t for t in re.split(r"\s+", text.strip()) if t]
    starts = list(range(0, max(len(toks), 1), stride))
    return [
        (s, " ".join(toks[s : s + size]), len(toks[s : s + size])) for s in starts
    ]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


@pytest.mark.parametrize("size,stride", [(12, 6), (4, 4), (8, 16)])
def test_chunks_match_python_twin(spark, docs, size, stride):
    rows = {r.doc_id: r.text for r in docs.collect()}
    got = {}
    for r in chunk_documents(docs, size=size, stride=stride).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_start, r.chunk_text, r.n_chunk_tokens)
        )
    for d, text in rows.items():
        assert sorted(got[d]) == sorted(_py_chunks(text, size, stride)), d


def test_chunks_edge_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "only"), (3, "a b c d e")], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.chunk_start): (r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, size=3, stride=2).collect()
    }
    # empty doc survives as one empty chunk (no silent row loss)
    assert out[(1, 0)] == ("", 0)
    assert out[(2, 0)] == ("only", 1)
    assert out[(3, 0)] == ("a b c", 3)
    assert out[(3, 2)] == ("c d e", 3)
    assert out[(3, 4)] == ("e", 1)
    assert len([k for k in out if k[0] == 3]) == 3


def test_chunks_reject_bad_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=0)


def test_dedup_segments_first_occurrence(spark, docs):
    segs = dedup_segments(docs, size=4).collect()
    by_fp = {}
    for r in segs:
        by_fp.setdefault(r.seg_fp, []).append(r)
    n_dupes = 0
    for fp, rs in by_fp.items():
        firsts = [r for r in rs if r.is_first]
        assert len(firsts) == 1, fp
        # the keep is the (doc_id, chunk_start)-minimal occurrence
        lo = min((r.doc_id, r.chunk_start) for r in rs)
        assert (firsts[0].doc_id, firsts[0].chunk_start) == lo
        n_dupes += len(rs) - 1
    assert n_dupes > 0  # the fixture corpus genuinely contains repeats
    # identical text => identical fingerprint partitioning
    texts = {}
    for r in segs:
        texts.setdefault(r.chunk_text, set()).add(r.seg_fp)
    assert all(len(v) == 1 for v in texts.values())


def test_reassemble_deduped_docs(spark):
    """Reassembly drops exactly the duplicate segments and restores
    original order; a fully-duplicated later doc comes back empty."""
    from databridge_etl_tools_spark.operators.chunking import reassemble_deduped_docs

    docs = spark.createDataFrame(
        [
            (1, "a b c d x1 y1 z1 w1"),
            (2, "m n o p a b c d"),  # 'a b c d' already seen in doc 1
            (3, "a b c d x1 y1 z1 w1"),  # full duplicate of doc 1
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in reassemble_deduped_docs(docs, size=4).collect()}
    assert out[1].clean_text == "a b c d x1 y1 z1 w1"
    assert out[2].clean_text == "m n o p"  # order restored, dup stripped
    assert out[3].clean_text == ""  # survives as a row, empty text
    assert (out[3].n_segments, out[3].n_kept, out[3].n_tokens_kept) == (2, 0, 0)
    assert out[2].n_kept == 1 and out[2].n_tokens_kept == 4


def test_reassemble_partition_independent(spark, docs):
    """clean_text is identical under different partitionings (the
    struct sort defuses collect_list's arrival-order nondeterminism)."""
    from databridge_etl_tools_spark.operators.chunking import reassemble_deduped_docs

    a = {
        r.doc_id: r.clean_text
        for r in reassemble_deduped_docs(docs.repartition(1), size=4).collect()
    }
    b = {
        r.doc_id: r.clean_text
        for r in reassemble_deduped_docs(docs.repartition(13, "text"), size=4).collect()
    }
    assert a == b
