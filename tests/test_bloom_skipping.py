"""Per-segment key blooms: the TableStore's data-skipping index for
keyed streaming ingest (``sources/bloom.py`` + the bloom-pruned
``upsert_epoch``).

The contract under test, in order of importance:

1. EXACTNESS never depends on the bloom — no false negatives, and
   every upsert sequence ends in the same state a plain dict replay
   produces (key uniqueness, last-write-wins per epoch).
2. An all-new-key batch commits with ZERO ledger reads (the probe is
   bloom-only) — pinned by spying the subset-read seam.
3. A changed-key batch rewrites ONLY the segments that might share a
   key; untouched segment directories survive by name.
4. Blooms merge losslessly across the segment-budget fold and are
   re-covered after ``compact()`` drops them.
"""

import pytest
from pyspark.sql import functions as F

from databridge_etl_tools_spark.sources import bloom as B
from databridge_etl_tools_spark.sources.table_store import TableStore


def _store(spark, path):
    """Bloom-path store: the adaptive threshold is forced to 0 so
    these tiny-ledger tests exercise the bloom machinery (the
    production default only engages it past BLOOM_MIN_ROWS)."""
    st = TableStore(spark, str(path))
    st.BLOOM_MIN_ROWS = 0
    return st


def _mk(spark, lo, hi, val="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit(val).alias("v")
    )


# -- bloom primitives -------------------------------------------------


def test_bloom_no_false_negatives_and_merge(spark):
    seg1 = _mk(spark, 0, 4000)
    seg2 = _mk(spark, 4000, 7000)
    b1 = B.bloom_build(seg1, ["doc_id"])
    b2 = B.bloom_build(seg2, ["doc_id"])
    lk = B.packed_lookup(spark, [b1, b2])
    probe = B.with_candidate_mask(_mk(spark, 0, 9000), lk, ["doc_id"])
    # membership is NEVER missed
    assert (
        probe.filter(
            (F.col("doc_id") < 4000) & ~F.col("__bloom_mask")[0]
        ).count()
        == 0
    )
    assert (
        probe.filter(
            (F.col("doc_id") >= 4000)
            & (F.col("doc_id") < 7000)
            & ~F.col("__bloom_mask")[1]
        ).count()
        == 0
    )
    # false positives stay rare at ~16 bits/key (not a correctness
    # bound — a loose sanity pin that the filter actually prunes)
    fp = probe.filter(
        (F.col("doc_id") >= 7000) & F.col("__bloom_mask")[0]
    ).count()
    assert fp < 100
    # OR-merge == bloom of the union (same sparse words)
    merged = B.bloom_or(b1, b2)
    direct = B.bloom_build(_mk(spark, 0, 7000), ["doc_id"])
    assert merged == direct
    # json round-trip
    assert B.bloom_from_json(B.bloom_to_json(b1)) == b1


# -- upsert_epoch integration ----------------------------------------


def test_all_new_batch_reads_zero_segments(spark, tmp_path, monkeypatch):
    store = _store(spark, tmp_path)
    assert store.upsert_epoch("t", _mk(spark, 0, 500), ["doc_id"], 0, scope="s")
    assert store.upsert_epoch("t", _mk(spark, 500, 900), ["doc_id"], 1, scope="s")
    calls = []
    orig = TableStore._read_segments

    def spy(self, table, segs):
        calls.append(list(segs))
        return orig(self, table, segs)

    monkeypatch.setattr(TableStore, "_read_segments", spy)
    # all-new keys: the bloom probe proves no segment can match, so
    # the commit must never read the accumulated ledger
    assert store.upsert_epoch("t", _mk(spark, 900, 1300), ["doc_id"], 2, scope="s")
    assert calls == []
    assert store.read("t").count() == 1300
    assert len(store._live_blooms("t", ["doc_id"])) == 3


def test_changed_key_rewrites_only_candidate_segments(spark, tmp_path):
    store = _store(spark, tmp_path)
    for e, (lo, hi) in enumerate([(0, 300), (300, 600), (600, 900)]):
        assert store.upsert_epoch("t", _mk(spark, lo, hi), ["doc_id"], e, scope="s")
    segs_before = store._segments("t")
    assert len(segs_before) == 3
    # change rows living only in the middle segment
    assert store.upsert_epoch(
        "t", _mk(spark, 400, 410, "CHANGED"), ["doc_id"], 3, scope="s"
    )
    segs_after = store._segments("t")
    # untouched segments survive by name; the candidate segment is
    # gone, replaced by the merged rewrite
    assert segs_before[0] in segs_after and segs_before[2] in segs_after
    assert segs_before[1] not in segs_after
    r = store.read("t")
    assert r.count() == 900
    assert r.filter(F.col("v") == "CHANGED").count() == 10
    assert (
        r.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    )
    # the rewrite re-covered its segment: probes can prune everything
    assert len(store._live_blooms("t", ["doc_id"])) == 3


def test_segment_budget_fold_merges_blooms(spark, tmp_path):
    store = _store(spark, tmp_path)
    store.SEGMENT_BUDGET  # class default untouched; pass explicit
    for e in range(3):
        assert store.upsert_epoch(
            "t", _mk(spark, e * 100, (e + 1) * 100), ["doc_id"], e, scope="s"
        )
    # force the fold through the keyed commit seam
    assert store._commit_keyed_segments(
        "t",
        store._segments("t"),
        _mk(spark, 300, 400),
        3,
        "s",
        ["doc_id"],
        store._segment_stats("t", ["doc_id"]),
        segment_budget=2,
    )
    assert len(store._segments("t")) == 1
    assert store.read("t").count() == 400
    # the folded bloom covers every key ever committed
    live = store._live_blooms("t", ["doc_id"])
    assert len(live) == 1
    lk = B.packed_lookup(spark, list(live.values()))
    probe = B.with_candidate_mask(_mk(spark, 0, 400), lk, ["doc_id"])
    assert probe.filter(~F.col("__bloom_mask")[0]).count() == 0


def test_compact_drops_then_recover(spark, tmp_path):
    store = _store(spark, tmp_path)
    assert store.upsert_epoch("t", _mk(spark, 0, 200), ["doc_id"], 0, scope="s")
    assert store.upsert_epoch("t", _mk(spark, 200, 400), ["doc_id"], 1, scope="s")
    store.compact("t")
    assert store._live_blooms("t", ["doc_id"]) == {}
    # identical re-send: reads the (uncovered) ledger once, appends
    # nothing new, and re-covers the compacted segment
    assert store.upsert_epoch("t", _mk(spark, 0, 50), ["doc_id"], 2, scope="s")
    assert store.read("t").count() == 400
    live = store._live_blooms("t", ["doc_id"])
    assert len(live) == len(store._segments("t"))


def test_mixed_sequence_matches_dict_replay(spark, tmp_path):
    """Operation-sequence sweep: interleaved new/identical/changed/
    tiebreak batches across many segments end in exactly the state a
    driver-side dict replay produces."""
    store = _store(spark, tmp_path)
    expect = {}

    def apply(rows, epoch, order=None):
        df = spark.createDataFrame(rows, "doc_id long, v string")
        store.upsert_epoch("t", df, ["doc_id"], epoch, scope="s",
                           staging_order=order)
        picked = {}
        for k, v in rows:
            if order is None:
                picked[k] = v
            else:  # first-wins under ascending order
                if k not in picked or v < picked[k]:
                    picked[k] = v
        expect.update(picked)

    apply([(i, "a") for i in range(50)], 0)
    apply([(i, "a") for i in range(50, 80)], 1)           # new
    apply([(i, "a") for i in range(20, 60)], 2)           # overlap, identical
    apply([(i, "B") for i in range(10, 15)], 3)           # changed
    apply([(90, "z2"), (90, "z1"), (5, "q")], 4, order=["v"])  # tiebreak
    apply([(i, "c") for i in range(100, 140)], 5)         # new again
    got = {r["doc_id"]: r["v"] for r in store.read("t").collect()}
    assert got == expect
    dup = store.read("t").groupBy("doc_id").count().filter(F.col("count") > 1)
    assert dup.count() == 0


def test_bloom_keys_mismatch_disables_skipping(spark, tmp_path):
    store = _store(spark, tmp_path)
    # the fresh-table commit is always bloom-less (a new table is by
    # definition below the adaptive threshold); the first
    # over-threshold upsert covers it
    assert store.upsert_epoch("t", _mk(spark, 0, 100), ["doc_id"], 0, scope="s")
    assert store._live_blooms("t", ["doc_id"]) == {}
    assert store.upsert_epoch("t", _mk(spark, 100, 200), ["doc_id"], 1, scope="s")
    assert store._live_blooms("t", ["doc_id"])
    # different key columns: recorded blooms don't apply
    assert store._live_blooms("t", ["v"]) == {}


def test_zone_maps_prune_monotone_ingest_without_blooms(spark, tmp_path, monkeypatch):
    """Segments too large for the bloom width store only their key
    zone map; monotone batches (ever-growing ids — the common ingest
    shape) are beyond every segment's max, so the probe prunes
    everything with pure literal comparisons: zero ledger reads,
    zero bloom joins."""
    store = _store(spark, tmp_path)
    store.BLOOM_MAX_KEYS = 100  # force every segment over the cap
    for e, (lo, hi) in enumerate([(0, 500), (500, 1100), (1100, 1500)]):
        assert store.upsert_epoch("t", _mk(spark, lo, hi), ["doc_id"], e, scope="s")
    stats = store._segment_stats("t", ["doc_id"])
    assert len(stats) == 3
    assert all(st["bloom"] is None for st in stats.values())
    assert all(st["range"] is not None for st in stats.values())
    calls = []
    orig = TableStore._read_segments

    def spy(self, table, segs):
        calls.append(list(segs))
        return orig(self, table, segs)

    monkeypatch.setattr(TableStore, "_read_segments", spy)
    assert store.upsert_epoch("t", _mk(spark, 1500, 2000), ["doc_id"], 3, scope="s")
    assert calls == []
    assert store.read("t").count() == 2000
    # an in-range re-send is still caught exactly (range true-positive)
    assert store.upsert_epoch("t", _mk(spark, 600, 610, "CHANGED"), ["doc_id"], 4, scope="s")
    r = store.read("t")
    assert r.filter(F.col("v") == "CHANGED").count() == 10
    assert r.count() == 2000
    assert r.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


def test_small_ledger_stays_on_classic_path(spark, tmp_path):
    """Under the production threshold a small table never pays the
    bloom machinery: no blooms recorded, results identical."""
    store = TableStore(spark, str(tmp_path))  # default BLOOM_MIN_ROWS
    assert store.upsert_epoch("t", _mk(spark, 0, 100), ["doc_id"], 0, scope="s")
    assert store.upsert_epoch("t", _mk(spark, 50, 150, "B"), ["doc_id"], 1, scope="s")
    assert store._live_blooms("t", ["doc_id"]) == {}
    got = {r["doc_id"]: r["v"] for r in store.read("t").collect()}
    assert len(got) == 150
    assert got[75] == "B" and got[10] == "a"
