"""Distributed BPE-style merge learning over the corpus.

The tokenizer-training primitive (Sennrich et al. 2016, token-level
variant): repeatedly find the most frequent ADJACENT unit pair and
fuse it into a new unit, left-to-right non-overlapping. ``bpe_fit``
learns the merge table; ``bpe_apply`` replays it over any corpus —
the learn/apply split every subword tokenizer pipeline has.

Determinism: each round's winning pair is the (count desc, a asc,
b asc) maximum — a total order — and the greedy left-to-right merge
is a pure function of the token sequence, so the merge table and the
re-tokenized corpus are identical across engines, partitionings and
retries. No RNG, no driver-order dependence.

Scale shape per round: ONE (a, b)-keyed pair-count shuffle over the
corpus + a driver collect of exactly ONE row (the argmax — same
bounded-scalar budget as a k-means centroid update), then a map-side
merge pass. The merge pass runs in ``mapInPandas`` — a genuine
can't-express case: the greedy non-overlapping fold carries
sequential state per document, and a Catalyst ``aggregate`` lambda
would rebuild the accumulator array per element (interpreted,
O(tokens²) per document — the repo's documented HOF hazard), while
the Arrow pass is O(tokens) per document. Each round's corpus is
re-materialized (lineage cut), so the plan never grows with the
merge count — the k-means/connected-components iteration discipline.

Rows-only in the catalog (an iterative fixpoint has no DuckDB twin);
the exact merge semantics are pinned against a pure-python BPE twin
in tests/test_bpe.py.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .materialize import materialize
from .textstats import tokens


def _pair_counts(units: DataFrame) -> DataFrame:
    pairs = F.expr(
        "transform(sequence(1, size(_toks) - 1),"
        " i -> struct(_toks[i - 1] AS a, _toks[i] AS b))"
    )
    return (
        units.where(F.size("_toks") >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _merge_pass(units: DataFrame, a: str, b: str, joined: str) -> DataFrame:
    """Left-to-right non-overlapping fuse of adjacent (a, b) → joined."""

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = []
            for toks in pdf["_toks"]:
                seq = list(toks)
                merged = []
                i = 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                        merged.append(joined)
                        i += 2
                    else:
                        merged.append(seq[i])
                        i += 1
                out.append(merged)
            pdf = pdf.copy()
            pdf["_toks"] = out
            yield pdf

    return units.mapInPandas(run, units.schema)


def bpe_fit(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 10,
    min_count: int = 2,
    sep: str = "▁",  # ▁ — marks learned merge boundaries
) -> "tuple[list[tuple[int, str, str, int]], DataFrame]":
    """Learn up to ``n_merges`` merge rules. Returns ``(merges,
    units)``: ``merges`` as ``[(step, a, b, count)]`` (the rule table,
    driver-side — n_merges bounded scalars, like k-means centroids)
    and ``units`` the re-tokenized corpus ``(<id_col>, _toks)`` after
    all merges. Stops early when no pair reaches ``min_count``."""
    units = materialize(
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    )
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        top = (
            _pair_counts(units)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < min_count:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((step, a, b, c))
        units = materialize(_merge_pass(units, a, b, f"{a}{sep}{b}"))
    return merges, units


def bpe_apply(
    docs: DataFrame,
    merges: "list[tuple[int, str, str, int]]",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "▁",
) -> DataFrame:
    """Replay a learned merge table over a corpus (training/serving
    parity): same greedy left-to-right semantics, applied in learned
    order. One Arrow pass per rule, zero shuffles."""
    units = materialize(
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    )
    for _, a, b, _c in sorted(merges):
        units = _merge_pass(units, a, b, f"{a}{sep}{b}")
    return units
