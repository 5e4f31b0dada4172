

def test_pagerank_py_matches_distributed_bit_for_bit(spark):
    """pagerank_py is the driver-side replica the bounded-graph
    curation queries rank with — every variant (weighted, unweighted
    + dangling, seeded + dangling) must match the distributed integer
    fixpoint bit-for-bit."""
    from databridge_etl_tools_spark.operators.graph import (
        pagerank,
        pagerank_py,
    )

    # (a) weighted bidirectional (the affinity-graph shape)
    wpairs = [(1, 2, 5), (2, 1, 5), (2, 3, 2), (3, 2, 2), (1, 3, 7),
              (3, 1, 7), (4, 1, 1), (1, 4, 1)]
    wdf = spark.createDataFrame(wpairs, "src long, dst long, w long")
    want = {
        r["node"]: r["rank_q"]
        for r in pagerank(wdf, iters=8, weight_col="w").collect()
    }
    assert pagerank_py(wpairs, iters=8) == want

    # (b) unweighted with a dangling node (5 has no out-edges) and a
    # duplicate edge (must count once)
    upairs = [(1, 2), (2, 3), (3, 1), (3, 5), (3, 5), (2, 5)]
    udf = spark.createDataFrame(upairs, "src long, dst long")
    want_u = {
        r["node"]: r["rank_q"] for r in pagerank(udf, iters=6).collect()
    }
    assert pagerank_py(upairs, iters=6) == want_u

    # (c) seeded (personalized) walk with dangling redistribution
    seeds = spark.createDataFrame([(1,), (3,)], "node long")
    want_s = {
        r["node"]: r["rank_q"]
        for r in pagerank(udf, iters=6, seeds=seeds).collect()
    }
    assert pagerank_py(upairs, iters=6, seeds=[1, 3]) == want_s

    # guards: oversized graphs and bad weights raise
    import pytest

    with pytest.raises(ValueError, match="bounded"):
        pagerank_py([(i, i + 1) for i in range(10)], max_edges=5)
    with pytest.raises(ValueError, match="positive"):
        pagerank_py([(1, 2, 0)])
