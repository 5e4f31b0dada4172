"""BPE merge learning vs pure-python twins: rule table, greedy
left-to-right non-overlapping semantics, early stop, apply parity —
for both the token-level incremental construction and the standard
word-frequency-table construction."""

from __future__ import annotations

from collections import Counter

from databridge_etl_tools_spark.operators.bpe import (
    bpe_apply,
    bpe_apply_words,
    bpe_fit,
    bpe_fit_words,
)

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


# ---- word-frequency-table construction (standard subword BPE) ----

WORD_CORPUS = [
    (0, "low lower lowest low low"),
    (1, "newer newest new low"),
    (2, "wide wider widest"),
    (3, ""),
]


def _py_bpe_words(texts, n_merges, min_count=2, sep="▁"):
    """Char-level BPE over the distinct-word frequency table."""
    freq = Counter(w for _, t in texts for w in t.split())
    units = {w: list(w) for w in freq}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, seq in units.items():
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += freq[w]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((step, a, b, c))
        joined = f"{a}{sep}{b}"
        for w, seq in units.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            units[w] = out
    return merges, units


def test_bpe_fit_words_matches_python_twin(spark):
    docs = spark.createDataFrame(WORD_CORPUS, "doc_id bigint, text string")
    merges, words = bpe_fit_words(docs, n_merges=8)
    exp_merges, exp_units = _py_bpe_words(WORD_CORPUS, 8)
    assert merges == exp_merges
    got = {r["w"]: list(r["_toks"]) for r in words.collect()}
    assert got == exp_units
    # freq-weighting matters: 'low' occurs 4× so (l,o) reaches 6
    # (low×4 + lower + lowest) while distinct-word counting would
    # give 3 — and the (l,o)/(o,w) tie resolves lexicographically
    assert merges[0] == (0, "l", "o", 6)


def test_bpe_apply_words_reassembles_in_order(spark):
    docs = spark.createDataFrame(WORD_CORPUS, "doc_id bigint, text string")
    merges, words = bpe_fit_words(docs, n_merges=8)
    _, exp_units = _py_bpe_words(WORD_CORPUS, 8)
    enc = {r["doc_id"]: list(r["_toks"]) for r in bpe_apply_words(docs, merges).collect()}
    for did, text in WORD_CORPUS:
        exp = [u for w in text.split() for u in exp_units[w]]
        assert enc[did] == exp, did
    # OOV handling: unseen words split into chars, learned merges apply
    new = spark.createDataFrame([(9, "lowly zzz")], "doc_id bigint, text string")
    enc9 = {r["doc_id"]: list(r["_toks"]) for r in bpe_apply_words(new, merges).collect()}
    # replay the python twin's merge rules over the OOV words
    def replay(word):
        seq = list(word)
        for _, a, b, _c in merges:
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(f"{a}▁{b}")
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq
    assert enc9[9] == replay("lowly") + replay("zzz")


def test_bpe_fit_words_driver_matches_distributed(spark):
    """The driver-side delta-update replica (vocab within budget) and
    the distributed per-round loop must be bit-identical: same merge
    list (incl. tie-breaks), same finished word table."""
    docs = spark.createDataFrame(WORD_CORPUS, "doc_id bigint, text string")
    m_drv, w_drv = bpe_fit_words(docs, n_merges=8)
    m_dist, w_dist = bpe_fit_words(docs, n_merges=8, driver_vocab_budget=0)
    assert m_drv == m_dist
    as_dict = lambda df: {  # noqa: E731
        r["w"]: (int(r["freq"]), list(r["_toks"])) for r in df.collect()
    }
    assert as_dict(w_drv) == as_dict(w_dist)
