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
