"""User event-sequence construction: ordering, truncation, tie-break,
partition independence."""

from __future__ import annotations

import datetime as dt

import pytest

from databridge_etl_tools_spark.operators.sequences import user_sequences


def _ev(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for i in range(15 if u == 1 else 3):
            rows.append((eid, u, t0 + dt.timedelta(minutes=i), f"e{i}"))
            eid += 1
    # user 3: equal timestamps — order must fall to event_id
    rows.append((100, 3, t0, "first"))
    rows.append((101, 3, t0, "second"))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string"
    )


def test_sequences_truncate_to_most_recent(spark):
    out = {r.user_id: r for r in user_sequences(_ev(spark), last_n=10).collect()}
    assert out[1].n_events == 15
    assert out[1].last_events == [f"e{i}" for i in range(5, 15)]  # last 10
    assert out[2].n_events == 3
    assert out[2].last_events == ["e0", "e1", "e2"]  # shorter than n: all kept
    assert out[3].last_events == ["first", "second"]  # event_id tie-break


def test_sequences_partition_independent(spark):
    ev = _ev(spark)
    a = {r.user_id: r.last_events for r in user_sequences(ev.repartition(1)).collect()}
    b = {
        r.user_id: r.last_events
        for r in user_sequences(ev.repartition(7, "event_type")).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        user_sequences(ev, last_n=0)


def test_dense_index_contract(spark):
    from databridge_etl_tools_spark.operators.sequences import dense_index

    df = spark.createDataFrame([(i * 7,) for i in range(50)], "doc_id long")
    got = {r.doc_id: r.row_index for r in dense_index(df).collect()}
    assert sorted(got.values()) == list(range(50))
    # index follows doc_id order
    ordered = sorted(got)
    assert [got[d] for d in ordered] == list(range(50))


def test_negative_samples_deterministic_and_self_free(spark):
    from databridge_etl_tools_spark.operators.sequences import negative_samples

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = sorted(
        (r.doc_id, r.draw, r.neg_doc_id) for r in negative_samples(df, k=3).collect()
    )
    b = sorted(
        (r.doc_id, r.draw, r.neg_doc_id)
        for r in negative_samples(df.repartition(5), k=3).collect()
    )
    assert a == b  # partition-independent
    assert all(d != n for d, _, n in a)  # self excluded
    per = {}
    for d, j, n in a:
        per.setdefault(d, set()).add(j)
        assert n in range(40)
    assert all(len(js) <= 3 for js in per.values())
    assert sum(len(js) for js in per.values()) >= 40 * 3 - 10  # few self-drops
    with pytest.raises(ValueError):
        negative_samples(df, k=0)


def test_epoch_shuffle_derived_shards_injective_and_resumable(spark):
    """epoch_shuffle: default n_shards derives from the input (the
    running_sum input-scaled rule), global_pos is injective, and
    positions are layout-independent (repartitioned input reproduces
    identical positions — the resumability contract)."""
    from databridge_etl_tools_spark.operators.sampling import epoch_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, "doc_id", n_shards=8).collect()
    assert len({r["global_pos"] for r in out}) == 500  # injective
    assert {r["shard"] for r in out} <= set(range(8))
    # resumable: a different physical layout gives identical positions
    out2 = epoch_shuffle(df.repartition(13), "doc_id", n_shards=8).collect()
    assert {(r["doc_id"], r["global_pos"]) for r in out} == {
        (r["doc_id"], r["global_pos"]) for r in out2
    }
    # derived default scales with the session/shuffle width
    auto = epoch_shuffle(df, "doc_id")
    n_sh = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert auto.agg({"shard": "max"}).collect()[0][0] <= max(
        df.rdd.getNumPartitions(), n_sh
    )


def test_curriculum_order_tiny_corpus_matches_global_rank(spark):
    """r8 advisor: with n < n_deciles the decile thresholds collide
    (ceil((d+1)n/10) equal for distinct d) and MUST be counted with
    multiplicity, or boundary rows land one decile low vs the global
    definition ((rn-1)*10) DIV n. n=3 exercises the collision."""
    from databridge_etl_tools_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(0, 30), (1, 10), (2, 20)], "doc_id long, n_chars long"
    )
    got = {
        r.doc_id: r.decile
        for r in curriculum_order(df, "doc_id", "n_chars", n_shards=4).collect()
    }
    # global ranks over n_chars*M+doc_id: doc 1 rn=1, doc 2 rn=2, doc 0 rn=3
    # decile = ((rn-1)*10) DIV 3 -> doc1: 0, doc2: 3, doc0: 6
    assert got == {1: 0, 2: 3, 0: 6}, got


def test_curriculum_order_default_shards_input_scaled(spark):
    """The n_shards default must follow the epoch_shuffle input-scaled
    rule, not a pinned constant (r8 verdict task #6)."""
    from databridge_etl_tools_spark.operators.sampling import curriculum_order

    df = spark.range(200).selectExpr("id AS doc_id", "id % 17 AS n_chars")
    expected = max(
        df.rdd.getNumPartitions(),
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    got = sorted(
        (r.doc_id, r.decile, r.pos)
        for r in curriculum_order(df, "doc_id", "n_chars").collect()
    )
    # the default must equal the epoch_shuffle rule exactly: same
    # positions as passing the rule's value explicitly, and NOT the
    # old pinned 16 (expected != 16 in any session configuration here)
    explicit = sorted(
        (r.doc_id, r.decile, r.pos)
        for r in curriculum_order(
            df, "doc_id", "n_chars", n_shards=expected
        ).collect()
    )
    assert got == explicit
    assert expected != 16
    assert len({(d, p) for _, d, p in got}) == len(got)  # injective


def test_curriculum_order_rejects_bad_key_inputs(spark):
    """The decile key difficulty*mult + id is only injective for
    integral difficulty and non-negative ids — both rejected loudly
    (r9 advice)."""
    import pytest

    from databridge_etl_tools_spark.operators.sampling import curriculum_order

    floaty = spark.createDataFrame(
        [(1, 0.5), (2, 1.5)], "doc_id long, diff double"
    )
    with pytest.raises(ValueError, match="must be integral"):
        curriculum_order(floaty, "doc_id", "diff", n_shards=2)
    negative = spark.createDataFrame(
        [(-1, 5), (2, 7)], "doc_id long, diff long"
    )
    with pytest.raises(ValueError, match="negative"):
        curriculum_order(negative, "doc_id", "diff", n_shards=2)
    huge = spark.createDataFrame(
        [(1, 1 << 40), (2, 1 << 41)], "doc_id long, diff long"
    )
    with pytest.raises(ValueError, match="overflows"):
        curriculum_order(huge.withColumn("doc_id", huge["doc_id"] + (1 << 30)), "doc_id", "diff", n_shards=2)


def test_weighted_sample_topk_python_twin_exact(spark):
    """A-ES exponential keys replay bit-for-bit against a python twin
    (hashlib md5 + fixtrig py_ln); selection and positions match."""
    import hashlib

    from databridge_etl_tools_spark.operators import fixtrig as FX
    from databridge_etl_tools_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, (i * 7) % 23 + 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r.doc_id, r.position, r._wrs_key)
        for r in weighted_sample_topk(df, "doc_id", "w", k=10)
        .orderBy("position")
        .collect()
    ]

    def key(i, w):
        h = int(hashlib.md5(f"wrs:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / float(1 << 32)
        return FX.py_ln(u, lo_exp=-33, hi_exp=1) / float(w)

    ranked = sorted(((key(i, w), i, w) for i, w in rows),
                    key=lambda t: (-t[0], t[1]))[:10]
    want = [(i, pos + 1, k) for pos, (k, i, w) in enumerate(ranked)]
    assert got == want


def test_weighted_sample_topk_rejects_nonpositive_weights(spark):
    import pytest

    from databridge_etl_tools_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame([(1, 0)], "doc_id long, w long")
    with pytest.raises(ValueError, match="positive"):
        weighted_sample_topk(df, "doc_id", "w", k=1)
