"""BPE merge learning vs a pure-python twin: rule table, greedy
left-to-right non-overlapping semantics, early stop, apply parity."""

from __future__ import annotations

from collections import Counter

from databridge_etl_tools_spark.operators.bpe import bpe_apply, bpe_fit

CORPUS = [
    (0, "a b a b a b c"),
    (1, "a b c d a b"),
    (2, "x a b y"),
    (3, "a a a"),
    (4, ""),
]


def _py_bpe(texts, n_merges, min_count=2, sep="▁"):
    units = {i: t.split() for i, t in texts}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for seq in units.values():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += 1
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((step, a, b, c))
        joined = f"{a}{sep}{b}"
        for k, seq in units.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            units[k] = out
    return merges, units


def test_bpe_fit_matches_python_twin(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    merges, units = bpe_fit(docs, n_merges=5)
    exp_merges, exp_units = _py_bpe(CORPUS, 5)
    assert merges == exp_merges
    got_units = {r["doc_id"]: list(r["_toks"]) for r in units.collect()}
    assert got_units == exp_units
    # first merge must be the most frequent pair: (a, b) count 5
    assert merges[0][1:] == ("a", "b", 6)
    # overlapping "a a a" merges non-overlapping: one fused + one bare
    # (after (a,a) is learned, if ever; with (a,b) first doc 3 is inert)


def test_bpe_overlap_and_early_stop(spark):
    rows = [(0, "z z z"), (1, "z z")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges, units = bpe_fit(docs, n_merges=10)
    exp_merges, exp_units = _py_bpe(rows, 10)
    assert merges == exp_merges
    assert {r["doc_id"]: list(r["_toks"]) for r in units.collect()} == exp_units
    # greedy non-overlap: "z z z" → ["z▁z", "z"]; then no pair reaches
    # min_count twice → early stop well before 10 rounds
    assert len(merges) < 10


def test_bpe_apply_replays_learned_rules(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    merges, units = bpe_fit(docs, n_merges=5)
    replay = bpe_apply(docs, merges)
    assert {r["doc_id"]: list(r["_toks"]) for r in replay.collect()} == {
        r["doc_id"]: list(r["_toks"]) for r in units.collect()
    }
