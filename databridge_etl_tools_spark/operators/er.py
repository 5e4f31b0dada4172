"""Entity resolution: parameterized rule-based record linkage.

The Fellegi-Sunter-family pipeline in its deterministic rule form —
the shape production linkage systems start from before learning
match weights:

1. **Blocking** — candidate pairs only within equal blocking keys
   (name prefix + exact auxiliary attributes), so candidate
   generation is an equi-join bounded by Σ block² — never n²
   comparisons.
2. **Match rule** — name edit distance ≤ ``max_edit`` inside the
   block (classic typo/OCR tolerance; ``levenshtein`` is identical
   in Spark and DuckDB).
3. **Transitive closure** — the min-label component fixpoint
   collapses pairwise-match chains into entities keyed by their
   minimum record id.

FALSE-MERGE CONTRACT (the knob production ER tunes): the rule MERGES
any two records whose names agree on the whole blocking prefix and
differ within ``max_edit`` edits in the remaining ``block_suffix``
characters, whenever all ``attrs`` also collide. For serial-numbered
name forms (``Customer#…01`` vs ``Customer#…02``) that is a false
merge by construction when the auxiliary attributes coincide —
tightening means widening ``attrs`` or dropping ``max_edit`` to 0,
at the cost of missing genuine typos (the precision/recall sweep in
``tests/test_er_sweep.py`` measures exactly this trade on planted
corpora). Transitivity can chain A~B~C into one entity even when
A and C differ by 2·``max_edit`` edits — inherent to
closure-based linkage, same contract as every production ER system
that clusters matches.

Reference parity: beyond-reference — the training-data charter's
record-linkage capability (dirty-duplicate collapse before corpus
statistics)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import connected_components
from .materialize import materialize


def link_records(
    recs: DataFrame,
    *,
    id_col: str = "rid",
    name_col: str = "name",
    attrs: "tuple[str, ...]" = ("seg", "nat"),
    block_suffix: int = 2,
    max_edit: int = 1,
    iters: int = 6,
    max_block: "int | None" = 10_000,
) -> DataFrame:
    """Rule-based linkage over a record table: returns the match-pair
    transitive closure as ``(node, label)`` (label = entity id = the
    entity's minimum record id). Records whose block is unique never
    enter the pair join; singletons simply don't appear (callers
    treat absent records as their own entity, or left-join).

    Knobs — see the module-level false-merge contract:
    ``block_suffix`` (name prefix length cut: bigger suffix = wider
    blocks = more recall, more candidates), ``max_edit`` (intra-block
    name tolerance), ``attrs`` (exact-match auxiliary attributes;
    every added attribute divides the false-merge rate by its
    selectivity), ``iters`` (closure rounds ≥ the expected match-
    chain diameter).

    Scale shape: one map-side block projection, one (block, attrs)
    equi-join whose condition embeds the edit-distance test, then
    the component fixpoint's one join + one min-agg per round.

    HOT-BLOCK GUARD (``max_block``): the pair join is quadratic
    WITHIN a block, so one skewed block (a dominant name prefix — an
    empty/placeholder name, a franchise brand) silently turns the
    bounded Σ block² cost into ~n²/2 comparisons. A bounded probe
    (one (block, attrs)-keyed count, top-1 collected) raises with
    remediation before the join runs; ``max_block=None`` opts out
    when the skew is intended."""
    if max_edit < 0 or block_suffix < 1:
        raise ValueError(
            f"link_records: need max_edit >= 0 and block_suffix >= 1, "
            f"got {max_edit}, {block_suffix}"
        )
    blocked = materialize(
        recs.withColumn(
            "block",
            F.expr(
                f"substr({name_col}, 1, length({name_col}) - {block_suffix})"
            ),
        )
    )
    if max_block is not None:
        # NULL-keyed rows can never pair (the equi-join condition
        # evaluates NULL), so they are not a quadratic hazard — drop
        # them from the probe or a large optional-name population
        # would raise spuriously
        nn = F.col("block").isNotNull()
        for at in attrs:
            nn = nn & F.col(at).isNotNull()
        hot = (
            blocked.where(nn)
            .groupBy("block", *[F.col(at) for at in attrs])
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("block"))
            .limit(1)
            .collect()
        )
        if hot and hot[0]["n"] > max_block:
            h = hot[0]
            raise ValueError(
                f"link_records: hot block {h['block']!r} x "
                f"{ {at: h[at] for at in attrs} } holds {h['n']} records "
                f"(> max_block={max_block}); the in-block pair join is "
                f"quadratic (~{h['n'] * (h['n'] - 1) // 2} candidate "
                f"comparisons). Remediate: lower block_suffix (keeps more "
                f"of the name in the blocking prefix), add discriminating "
                f"attrs, pre-split/salt the hot block, or raise max_block "
                f"if the skew is intended."
            )
    a, b = blocked.alias("a"), blocked.alias("b")
    cond = (F.col("a.block") == F.col("b.block"))
    for at in attrs:
        cond = cond & (F.col(f"a.{at}") == F.col(f"b.{at}"))
    cond = (
        cond
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (
            F.levenshtein(F.col(f"a.{name_col}"), F.col(f"b.{name_col}"))
            <= max_edit
        )
    )
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("ra"), F.col(f"b.{id_col}").alias("rb")
    )
    edges = pairs.selectExpr("ra AS src", "rb AS dst").unionByName(
        pairs.selectExpr("rb AS src", "ra AS dst")
    )
    return connected_components(edges, iters=iters)


def link_records_py(
    recs: "list[tuple]",
    *,
    attrs_idx: "tuple[int, ...]" = (2, 3),
    block_suffix: int = 2,
    max_edit: int = 1,
) -> "dict[object, object]":
    """Pure-python replay of :func:`link_records` for property sweeps
    (same blocking, match rule, and full transitive closure — exact,
    not ``iters``-bounded, so tests compare engine labels against
    the true closure). ``recs`` rows are ``(rid, name, *attrs)``;
    returns ``{rid: entity}`` for every record (singletons map to
    themselves)."""
    import itertools

    def lev(s: str, t: str) -> int:
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (cs != ct),
                    )
                )
            prev = cur
        return prev[-1]

    blocks: dict[tuple, list[tuple]] = {}
    for r in recs:
        key = (r[1][: len(r[1]) - block_suffix],) + tuple(
            r[i] for i in attrs_idx
        )
        blocks.setdefault(key, []).append(r)
    parent = {r[0]: r[0] for r in recs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in blocks.values():
        for ra, rb in itertools.combinations(members, 2):
            if lev(ra[1], rb[1]) <= max_edit:
                fa, fb = find(ra[0]), find(rb[0])
                if fa != fb:
                    lo, hi = (fa, fb) if str(fa) < str(fb) else (fb, fa)
                    parent[hi] = lo
    # min-id canonical labels (match the engine's min-label closure)
    groups: dict[object, list] = {}
    for r in recs:
        groups.setdefault(find(r[0]), []).append(r[0])
    out = {}
    for mem in groups.values():
        lab = min(mem)
        for rid in mem:
            out[rid] = lab
    return out
