"""Connected components: known graphs + convergence on chains."""

import pandas as pd

from gujarati_readability_pagewise_spark.operators.components import (
    connected_components,
)


def _cc(spark, pairs):
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["a", "b"]))
    rows = connected_components(df).collect()
    return {r["doc_id"]: r["component"] for r in rows}


def test_two_separate_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_to_min(spark):
    # a 12-node path: worst case for propagation depth
    got = _cc(spark, [(i, i + 1) for i in range(5, 17)])
    assert set(got.values()) == {5}
    assert len(got) == 13


def test_cycle_and_bridge(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (7, 8)])
    assert got[4] == 1 and got[1] == 1
    assert got[8] == 7


def test_nonconvergence_raises_instead_of_splitting(spark):
    import pytest

    from gujarati_readability_pagewise_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(8)], columns=["a", "b"])
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)


def test_pagerank_fixedpoint_properties(spark):
    """Fixed-point PageRank: mass conservation (up to floor loss), a pure
    sink-free 3-regular graph keeps near-uniform ranks, and a node every
    edge points at dominates a star graph."""
    import pandas as pd
    from pyspark.sql import functions as F2

    from gujarati_readability_pagewise_spark.operators.graph import (
        degrees,
        pagerank_fixedpoint,
    )

    # star: everyone links to node 0
    n = 20
    edges = spark.createDataFrame(
        pd.DataFrame({"src": list(range(1, n)), "dst": [0] * (n - 1)})
    )
    nodes = spark.createDataFrame(pd.DataFrame({"node": list(range(n))}))
    r = pagerank_fixedpoint(edges, nodes, n_iter=5).toPandas().set_index("node")
    assert r.loc[0, "rank_fp"] == r.rank_fp.max()
    assert r.loc[0, "rank_fp"] > 5 * r.drop(0).rank_fp.max()
    # leaves all equal (symmetry)
    assert r.drop(0).rank_fp.nunique() == 1
    # mass: total <= scale, and not degenerate
    assert 0 < r.rank_fp.sum() <= 10**9

    d = degrees(edges).toPandas().set_index("node")
    assert d.loc[0, "in_deg"] == n - 1 and d.loc[0, "out_deg"] == 0
    assert (d.drop(0).out_deg == 1).all()


def test_pagerank_deterministic_across_partitionings(spark):
    """Integer arithmetic makes the result partitioning-independent —
    the property that lets DuckDB hash-match the iterative Spark plan."""
    import pandas as pd

    from gujarati_readability_pagewise_spark.operators.graph import (
        pagerank_fixedpoint,
    )

    rows = [(i, (i * 7 + 3) % 50) for i in range(50)] + [
        (i, (i * 11 + 1) % 50) for i in range(50)
    ]
    pdf = pd.DataFrame(rows, columns=["src", "dst"])
    nodes = spark.createDataFrame(pd.DataFrame({"node": list(range(50))}))
    a = (
        pagerank_fixedpoint(spark.createDataFrame(pdf).repartition(1), nodes, 4)
        .orderBy("node").toPandas()
    )
    b = (
        pagerank_fixedpoint(spark.createDataFrame(pdf).repartition(16), nodes, 4)
        .orderBy("node").toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_pagerank_deep_iteration_flat_plan(spark):
    """n_iter=20 must be practical: the loop-invariant edges⋈outdeg join is
    hoisted and ranks are localCheckpoint-ed every 5 iterations, so the
    logical plan of the result stays FLAT (bounded by the trailing
    un-checkpointed window) instead of growing with n_iter — and deep
    iteration agrees with itself under different partitionings."""
    import pandas as pd

    from gujarati_readability_pagewise_spark.operators.graph import (
        pagerank_fixedpoint,
    )

    rows = [(i, (i * 7 + 3) % 30) for i in range(30)] + [
        (i, (i * 11 + 1) % 30) for i in range(30)
    ]
    pdf = pd.DataFrame(rows, columns=["src", "dst"])
    nodes = spark.createDataFrame(pd.DataFrame({"node": list(range(30))}))
    edges = spark.createDataFrame(pdf)

    plan10 = pagerank_fixedpoint(edges, nodes, n_iter=10)._jdf.queryExecution().logical().toString()
    plan20 = pagerank_fixedpoint(edges, nodes, n_iter=20)._jdf.queryExecution().logical().toString()
    # both end with the same 5-iteration un-checkpointed tail -> same size
    # (without the checkpoint the 20-iter plan would be ~2x the 10-iter one)
    assert len(plan20) < 1.2 * len(plan10)

    a = pagerank_fixedpoint(edges.repartition(1), nodes, n_iter=20).orderBy("node").toPandas()
    b = pagerank_fixedpoint(edges.repartition(16), nodes, n_iter=20).orderBy("node").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_cluster_representatives_endpoint(spark):
    """Per component exactly one survivor (highest quality, tie -> lowest
    id); singletons survive as their own component."""
    import pandas as pd
    from pyspark.sql import functions as F

    from gujarati_readability_pagewise_spark.operators.components import (
        cluster_representatives,
        connected_components,
    )

    pairs = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3), (5, 6)], columns=["a", "b"])
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2, 3, 4, 5, 6], "n_chars": [10, 30, 30, 7, 9, 9]}
        )
    )
    clusters = connected_components(pairs)
    out = {
        r["doc_id"]: (r["component"], r["is_survivor"])
        for r in cluster_representatives(clusters, docs).collect()
    }
    # cluster {1,2,3}: 2 and 3 tie on quality -> 2 wins (lower id)
    assert out[1] == (1, 0) and out[2] == (1, 1) and out[3] == (1, 0)
    # singleton 4 survives as its own component
    assert out[4] == (4, 1)
    # cluster {5,6}: tie -> 5
    assert out[5] == (5, 1) and out[6] == (5, 0)
    # exactly one survivor per component
    from collections import Counter

    surv = Counter(c for (c, s) in out.values() if s == 1)
    comps = {c for (c, _) in out.values()}
    assert surv == Counter({c: 1 for c in comps})
