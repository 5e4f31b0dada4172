"""A/B parity for the ANN driver routes (kmeans_fit, kcenter_greedy):
routed (one Arrow collect + numpy loop) and distributed paths must
return IDENTICAL centroids/assignments/selections. Toggled via
SPARK_GRAFT_ANN_DRIVER_ROWS."""

import os

import pytest

from databridge_etl_tools_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def spark():
    from databridge_etl_tools_spark.session import get_session

    yield get_session("test-ann-np")


def _both(fn):
    os.environ["SPARK_GRAFT_ANN_DRIVER_ROWS"] = "0"
    try:
        dist = fn()
    finally:
        os.environ["SPARK_GRAFT_ANN_DRIVER_ROWS"] = "100000000"
    try:
        routed = fn()
    finally:
        del os.environ["SPARK_GRAFT_ANN_DRIVER_ROWS"]
    return dist, routed


def _emb(spark, sf="/root/testdata/sf0.001"):
    from databridge_etl_tools_spark.registry import table

    return table(spark, sf, "embeddings")


def test_kmeans_fit_parity(spark):
    def run():
        cents, asg = SIM.kmeans_fit(_emb(spark), k=8, iters=3)
        return cents, sorted(map(tuple, asg.collect()))

    (dc, da), (rc, ra) = _both(run)
    assert dc == rc  # float centroid lists bit-identical
    assert da == ra


def test_kmeans_fit_parity_more_iters_and_small_k(spark):
    def run():
        cents, asg = SIM.kmeans_fit(_emb(spark), k=3, iters=6)
        return cents, sorted(map(tuple, asg.collect()))

    (dc, da), (rc, ra) = _both(run)
    assert dc == rc
    assert da == ra


def test_kcenter_parity(spark):
    def run():
        return sorted(
            map(tuple, SIM.kcenter_greedy(_emb(spark), k=8).collect())
        )

    d, r = _both(run)
    assert d == r


def test_kcenter_k_exceeds_rows(spark):
    emb = _emb(spark).limit(3)

    def run():
        return sorted(
            map(tuple, SIM.kcenter_greedy(emb, k=5).collect())
        )

    d, r = _both(run)
    assert d == r
