"""Golden-value unit tests for the DamFrame verb layer, mirroring the
reference's inline-expected-tensor style (testDf.nim, SURVEY.md §5) on tiny
literal frames."""

import pytest
from pyspark.sql import functions as F

from datamancer_spark import to_df
from tests.conftest import rows_set


@pytest.fixture(scope="module")
def mini(spark):
    # mirrors the shape of testDf.nim's small fixtures
    return to_df(
        {
            "x": [1, 2, 3, 4, 5, 6],
            "y": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
            "g": ["a", "a", "b", "b", "b", "c"],
        },
        spark,
    )


def test_filter(mini):
    out = mini.filter(F.col("x") > 3)
    assert rows_set(out.df) == [(4, 40.0, "b"), (5, 50.0, "b"), (6, 60.0, "c")]


def test_filter_reducing_keeps_all_or_none(mini):
    # reference: reducing (<<) filter keeps/drops the whole frame
    # (dataframe.nim:1360-1385)
    assert mini.filter(F.mean("x") > 3).count_rows() == 6
    assert mini.filter(F.mean("x") > 100).count_rows() == 0


def test_select_and_rename(mini):
    out = mini.select("x", F.col("y").alias("z"))
    assert out.columns == ["x", "z"]
    out2 = mini.rename(new_x="x")
    assert "new_x" in out2.columns and "x" not in out2.columns


def test_relocate(mini):
    assert mini.relocate("g").columns == ["g", "x", "y"]
    assert mini.relocate("g", after="x").columns == ["x", "g", "y"]
    assert mini.relocate("y", before="x").columns == ["y", "x", "g"]


def test_mutate_row_and_scalar(mini):
    out = mini.mutate(z=F.col("x") * 2)
    assert [r["z"] for r in out.arrange("x").collect()] == [2, 4, 6, 8, 10, 12]
    # scalar broadcast (fkScalar, dataframe.nim:1674-1775)
    out2 = mini.mutate(m=F.mean("y"))
    assert all(r["m"] == 35.0 for r in out2.collect())


def test_grouped_mutate_broadcast(mini):
    out = mini.group_by("g").mutate(gm=F.mean("x")).arrange("x")
    got = [(r["g"], r["gm"]) for r in out.collect()]
    assert got == [
        ("a", 1.5), ("a", 1.5), ("b", 4.0), ("b", 4.0), ("b", 4.0), ("c", 6.0)
    ]


def test_transmute(mini):
    out = mini.transmute(dbl=F.col("x") * 2)
    assert out.columns == ["dbl"]


def test_grouped_transmute_keeps_keys(mini):
    out = mini.group_by("g").transmute(dbl=F.col("x") * 2)
    assert set(out.columns) == {"g", "dbl"}


def test_masked_assign(mini):
    out = mini.masked_assign("y", F.col("x") > 4, 0.0).arrange("x")
    assert [r["y"] for r in out.collect()] == [10.0, 20.0, 30.0, 40.0, 0.0, 0.0]


def test_arrange_desc(mini):
    out = mini.arrange("x", ascending=False)
    assert [r["x"] for r in out.collect()] == [6, 5, 4, 3, 2, 1]


def test_head_tail_slice(mini):
    assert [r["x"] for r in mini.head(2, order_by=["x"]).collect()] == [1, 2]
    assert [r["x"] for r in mini.tail(2, order_by=["x"]).collect()] == [5, 6]
    assert [r["x"] for r in mini.slice_rows(1, 3, order_by=["x"]).collect()] == [2, 3, 4]


def test_summarize_grouped(mini):
    out = mini.group_by("g").summarize(n=F.count(F.lit(1)), s=F.sum("x"))
    assert rows_set(out.df) == [("a", 2, 3), ("b", 3, 12), ("c", 1, 6)]


def test_summarize_ungrouped_one_row(mini):
    out = mini.summarize(s=F.sum("x"))
    assert rows_set(out.df) == [(21,)]


def test_count(mini):
    assert rows_set(mini.count("g").df) == [("a", 2), ("b", 3), ("c", 1)]


def test_grouped_filter_reducing(mini):
    # keep only groups with >= 2 rows (whole-group semantics)
    out = mini.group_by("g").filter(F.count(F.lit(1)) >= 2)
    assert sorted({r["g"] for r in out.collect()}) == ["a", "b"]


def test_unique_first_occurrence(mini):
    # first-occurrence semantics via explicit order (dataframe.nim:2370-2422)
    out = mini.unique("g", order_by=["x"])
    assert rows_set(out.select("g", "x").df) == [("a", 1), ("b", 3), ("c", 6)]


def test_bind_rows_null_fill(spark):
    a = to_df({"x": [1, 2], "y": ["p", "q"]}, spark)
    b = to_df({"x": [3], "z": [9.5]}, spark)
    out = a.bind_rows(b, id="src")
    rows = rows_set(out.select("x", "y", "src", "z").df)
    assert rows == [(1, "p", "0", None), (2, "q", "0", None), (3, None, "1", 9.5)]


def test_concat_requires_same_columns(spark):
    a = to_df({"x": [1]}, spark)
    b = to_df({"q": [2]}, spark)
    with pytest.raises(ValueError):
        a.concat(b)


def test_set_diff_multiset(spark):
    a = to_df({"x": [1, 1, 2, 3]}, spark)
    b = to_df({"x": [1, 3]}, spark)
    # exceptAll: one copy of 1 survives (multiset semantics,
    # dataframe.nim:2140-2195 row-hash behavior)
    assert rows_set(a.set_diff(b).df) == [(1,), (2,)]


def test_set_diff_symmetric(spark):
    a = to_df({"x": [1, 2]}, spark)
    b = to_df({"x": [2, 3]}, spark)
    assert rows_set(a.set_diff(b, symmetric=True).df) == [(1,), (3,)]


def test_gather_spread_roundtrip(spark):
    wide = to_df({"id": [1, 2], "a": [10.0, 30.0], "b": [20.0, 40.0]}, spark)
    long = wide.gather(["a", "b"], key="k", value="v")
    assert long.count_rows() == 4
    back = long.spread("k", "v")
    assert rows_set(back.df) == [(1, 10.0, 20.0), (2, 30.0, 40.0)]


def test_lag_lead(mini):
    out = mini.lag("y", 1, order_by=["x"], out="prev").arrange("x")
    assert [r["prev"] for r in out.collect()] == [None, 10.0, 20.0, 30.0, 40.0, 50.0]
    out2 = mini.group_by("g").lead("y", 1, order_by=["x"], out="nxt").arrange("x")
    assert [r["nxt"] for r in out2.collect()] == [20.0, None, 40.0, 50.0, None, None]


def test_lag_requires_order(mini):
    with pytest.raises(ValueError):
        mini.lag("y")


def test_drop_null_and_nan(spark):
    d = to_df({"x": [1.0, float("nan"), 3.0], "y": [1, 2, 3]}, spark)
    assert d.drop_nan("x").count_rows() == 2
    e = to_df({"x": [1, None, 3]}, spark)
    assert e.drop_null("x").count_rows() == 2


def test_to_df_ragged_padding(spark):
    # len-1 → constant column; shorter → null-padded (dataframe.nim:409-419)
    d = to_df({"a": [1, 2, 3], "c": [7]}, spark)
    rows = rows_set(d.df)
    assert rows == [(1, 7), (2, 7), (3, 7)]


def test_shuffle_is_permutation(mini):
    out = mini.shuffle(seed=42)
    assert sorted(r["x"] for r in out.collect()) == [1, 2, 3, 4, 5, 6]


def test_rollup_and_cube(mini):
    r = mini.rollup("g", n=F.count(F.lit(1)))
    # 3 groups + 1 grand total
    assert r.count_rows() == 4
    c = mini.cube("g", n=F.count(F.lit(1)))
    assert c.count_rows() == 4


def test_bind_rows_type_promotion_numeric(spark):
    # int + float columns combine to double (combinedColKind,
    # column.nim:507-522)
    a = to_df({"x": [1, 2]}, spark)
    b = to_df({"x": [3.5]}, spark)
    out = a.bind_rows(b)
    assert dict(out.df.dtypes)["x"] == "double"
    assert sorted(r["x"] for r in out.collect()) == [1.0, 2.0, 3.5]


def test_bind_rows_type_promotion_object(spark):
    # incompatible kinds promote to string (the colObject stand-in)
    a = to_df({"x": [1, 2]}, spark)
    b = to_df({"x": ["hello"]}, spark)
    out = a.bind_rows(b)
    assert dict(out.df.dtypes)["x"] == "string"
    assert sorted(r["x"] for r in out.collect()) == ["1", "2", "hello"]


def test_masked_assign_promotes_on_conflict(spark):
    # assigning a string into an int column rewrites the column as string
    # (column.nim:794-844) instead of failing
    d = to_df({"x": [1, 2, 3]}, spark)
    out = d.masked_assign("x", F.col("x") > 2, "big")
    assert dict(out.df.dtypes)["x"] == "string"
    assert sorted(r["x"] for r in out.collect()) == ["1", "2", "big"]


def test_chained_conditional(mini):
    # if/elif/else formula chains (formula.nim:1073-1078) -> stacked whens
    out = mini.mutate(
        band=F.when(F.col("x") <= 2, "low")
        .when(F.col("x") <= 4, "mid")
        .otherwise("high")
    ).arrange("x")
    assert [r["band"] for r in out.collect()] == [
        "low", "low", "mid", "mid", "high", "high",
    ]


def test_drop_nan_no_float_columns_is_noop(spark):
    d = to_df({"x": [1, 2], "s": ["a", "b"]}, spark)
    assert d.drop_nan().count_rows() == 2


def test_select_grouped_with_aliased_key(mini):
    # a Column arg that yields the group key must not duplicate it
    out = mini.group_by("g").select(F.col("g"), F.col("x").alias("xx"))
    assert out.columns == ["g", "xx"]


def test_relocate_anchor_in_moved_raises(mini):
    with pytest.raises(ValueError):
        mini.relocate("g", "x", after="x")


def test_with_row_id_unique(mini):
    out = mini.with_row_id()
    ids = [r["_row_id"] for r in out.collect()]
    assert len(set(ids)) == len(ids)


def test_sample_bounded(mini):
    out = mini.sample(0.5, seed=7)
    assert 0 <= out.count_rows() <= 6


def test_spread_partitions_preserves_rows(mini):
    out = mini.spread_partitions(4)
    assert out.count_rows() == 6
    assert out.df.rdd.getNumPartitions() == 4


def test_as_view_registers(mini, spark):
    mini.as_view("mini_view")
    assert spark.sql("SELECT count(*) AS n FROM mini_view").collect()[0]["n"] == 6


def test_random_head(mini):
    out = mini.random_head(3, seed=1)
    assert out.count_rows() == 3


def test_grouped_mutate_mixed_expression_clear_error(spark):
    """A mutate expression mixing row-level columns with a whole-group
    reduction can't take the agg+join rewrite; it must fail with the
    actionable two-step suggestion, not a raw Spark GROUP BY error."""
    import pytest
    from pyspark.sql import functions as F

    from datamancer_spark.frame import DamFrame

    df = DamFrame(
        spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], "k long, v double")
    )
    with pytest.raises(ValueError, match="Split it"):
        df.group_by("k").mutate(share=F.col("v") / F.sum("v"))
    # the documented two-step form works
    out = (
        df.group_by("k")
        .mutate(total=F.sum("v"))
        .ungroup()
        .mutate(share=F.col("v") / F.col("total"))
    )
    got = {(r["k"], r["v"]): r["share"] for r in out.collect()}
    assert got[(1, 2.0)] == 2.0 / 6.0 and got[(2, 6.0)] == 1.0


def test_grouped_mutate_uses_window_and_falls_back_for_distinct(spark):
    """r7: grouped mutate rewrites reductions as window aggregates (one
    shuffle, no join — 0.41s vs 0.85s at the 150k-group anchor);
    DISTINCT aggregates aren't window-expressible and must fall back to
    the agg + null-safe-join-back path with identical semantics."""
    from pyspark.sql import functions as F

    from datamancer_spark import DamFrame

    d = DamFrame(spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 3), (None, 4), (None, 4)],
        "k string, v int",
    ))
    out = d.group_by("k").mutate(total=F.sum("v")).ungroup()
    plan = out.df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition" in plan.lower()  # window path taken
    rows = {(r["k"], r["v"], r["total"]) for r in out.df.collect()}
    assert ("a", 1, 4) in rows and ("b", 3, 3) in rows
    assert (None, 4, 8) in rows  # NULL keys group together

    nd = d.group_by("k").mutate(nd=F.count_distinct("v")).ungroup()
    plan2 = nd.df._jdf.queryExecution().optimizedPlan().toString()
    assert "join" in plan2.lower()  # fallback path taken
    got = {(r["k"], r["v"], r["nd"]) for r in nd.df.collect()}
    assert ("a", 1, 2) in got and ("b", 3, 1) in got
    assert (None, 4, 1) in got  # null-safe join keeps NULL-key rows


def test_spread_fill_parity(spark):
    """Pin the documented spread-fill divergence (VERDICT r12 #7): the
    reference default-initializes missing pivot cells to the dtype's
    native default (dataframe.nim:2273-2275 — valuesFill is ignored),
    while DamFrame.spread leaves them NULL unless fill= is passed.
    fill=0 must reproduce the reference's sparse runnableExample
    (dataframe.nim:2287-2297: class C has an extra row, A/B backfill 0)."""
    from datamancer_spark.frame import DamFrame

    df = spark.createDataFrame(
        [("r0", "A", 1), ("r1", "A", 8), ("r2", "A", 0),
         ("r0", "B", 3), ("r1", "B", 4),
         ("r0", "C", 0), ("r1", "C", 5), ("r2", "C", 7), ("r3", "C", 2)],
        "rid string, Class string, Num int",
    )
    wide = DamFrame(df).spread("Class", "Num", fill=0)
    got = {r["rid"]: (r["A"], r["B"], r["C"]) for r in wide.collect()}
    # reference semantics: missing (r2,B), (r3,A), (r3,B) become 0
    assert got["r2"] == (0, 0, 7)
    assert got["r3"] == (0, 0, 2)
    # and the default (no fill) keeps SQL NULLs — the documented divergence
    wide_null = DamFrame(df).spread("Class", "Num")
    gotn = {r["rid"]: (r["A"], r["B"], r["C"]) for r in wide_null.collect()}
    assert gotn["r3"] == (None, None, 2)
