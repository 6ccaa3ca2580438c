"""Join semantics: collision policies (dataframe.nim:1857-1883) and the
Spark-native join types we expose beyond the reference."""

import pytest
from pyspark.sql import functions as F

from datamancer_spark import to_df
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def left(spark):
    return to_df({"k": [1, 2, 3], "v": [10, 20, 30], "tag": ["l1", "l2", "l3"]}, spark)


@pytest.fixture(scope="module")
def right(spark):
    return to_df({"k": [2, 3, 4], "w": [200, 300, 400], "tag": ["r2", "r3", "r4"]}, spark)


def test_inner_join_rename_policy(left, right):
    out = left.inner_join(right, by="k", common="rename")
    assert set(out.columns) == {"k", "v", "tag_left", "w", "tag_right"}
    assert rows_set(out.select("k", "tag_left", "tag_right").df) == [
        (2, "l2", "r2"),
        (3, "l3", "r3"),
    ]


def test_inner_join_left_policy(left, right):
    out = left.inner_join(right, by="k", common="left")
    assert set(out.columns) == {"k", "v", "tag", "w"}
    assert rows_set(out.select("k", "tag").df) == [(2, "l2"), (3, "l3")]


def test_inner_join_drop_policy(left, right):
    out = left.inner_join(right, by="k", common="drop")
    assert set(out.columns) == {"k", "v", "w"}


def test_left_join(left, right):
    out = left.left_join(right, by="k", common="drop")
    assert rows_set(out.select("k", "w").df) == [(1, None), (2, 200), (3, 300)]


def test_full_join(left, right):
    out = left.full_join(right, by="k", common="drop")
    assert out.count_rows() == 4


def test_semi_anti(left, right):
    assert rows_set(left.semi_join(right, by="k").select("k").df) == [(2,), (3,)]
    assert rows_set(left.anti_join(right, by="k").select("k").df) == [(1,)]


def test_multi_key_join(spark):
    a = to_df({"k1": [1, 1, 2], "k2": ["x", "y", "x"], "v": [1, 2, 3]}, spark)
    b = to_df({"k1": [1, 2], "k2": ["y", "x"], "w": [10, 20]}, spark)
    out = a.inner_join(b, by=["k1", "k2"])
    assert rows_set(out.select("v", "w").df) == [(2, 10), (3, 20)]


def test_join_fold_varargs(spark):
    # reference innerJoin(dfs: varargs) left-fold (dataframe.nim:1994-2005)
    import functools

    frames = [
        to_df({"k": [1, 2], "a": [1, 2]}, spark),
        to_df({"k": [1, 2], "b": [3, 4]}, spark),
        to_df({"k": [2], "c": [5]}, spark),
    ]
    out = functools.reduce(lambda x, y: x.inner_join(y, by="k"), frames)
    assert rows_set(out.df) == [(2, 2, 4, 5)]


def test_broadcast_hint_in_plan(left, right):
    out = left.inner_join(right, by="k", common="drop", broadcast_right=True)
    plan = out.df._sc is not None and out.df.queryExecution if hasattr(out.df, "queryExecution") else None
    explained = out.df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in explained
