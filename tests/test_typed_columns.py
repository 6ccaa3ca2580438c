"""define_column_type — the runnable twin of the reference's
defColumn/colGeneric user column types (column.nim:207-224,
playground/non_generic_generics.nim:22-40): construct a KiloGram-style
unit column and a Measurement value±error column, then filter/mutate
straight through them."""

import pytest
from pyspark.sql import functions as F

from datamancer_spark.frame import to_df
from datamancer_spark.functions.typed import define_column_type

KiloGram = define_column_type("KiloGram", "double")
Measurement = define_column_type(
    "Measurement", {"value": "double", "error": "double"}
)


class TestUnitType:
    def test_construct_access_update(self, spark):
        # @[1.kg, 2.kg].toTensor; c[0, KiloGram]; c[0] = 1.5.kg
        d = to_df({"id": [1, 2]}, spark).mutate(
            w=KiloGram.build(F.col("id") * 1.0)
        )
        assert dict(d.df.dtypes)["w"] == "struct<value:double>"
        KiloGram.validate(d.df, "w")
        vals = {r["id"]: r["v"] for r in d.mutate(v=KiloGram.value("w")).collect()}
        assert vals == {1: 1.0, 2: 2.0}
        upd = d.mutate(
            w=F.when(F.col("id") == 1, KiloGram.build(1.5)).otherwise(F.col("w"))
        )
        vals = {r["id"]: r["v"] for r in upd.mutate(v=KiloGram.value("w")).collect()}
        assert vals == {1: 1.5, 2: 2.0}

    def test_filter_and_mutate_through_unit(self, spark):
        d = to_df({"id": [1, 2, 3]}, spark).mutate(
            w=KiloGram.build(F.col("id") * 2.0)
        )
        heavy = d.filter(KiloGram.value("w") > 3.0)
        assert sorted(r["id"] for r in heavy.collect()) == [2, 3]
        doubled = d.mutate(w=KiloGram.map_value("w", lambda v: v * 2))
        assert dict(doubled.df.dtypes)["w"] == "struct<value:double>"
        vals = {r["id"]: r["v"] for r in doubled.mutate(v=KiloGram.value("w")).collect()}
        assert vals == {1: 4.0, 2: 8.0, 3: 12.0}


class TestMeasurement:
    def test_value_error_roundtrip(self, spark):
        # @[1.0 ± 0.1, 2.0 ± 0.5]
        d = to_df({"id": [1, 2]}, spark).mutate(
            m=F.when(F.col("id") == 1, Measurement.build(1.0, 0.1))
            .otherwise(Measurement.build(2.0, 0.5))
        )
        Measurement.validate(d.df, "m")
        rows = {r["id"]: (r["v"], r["e"]) for r in d.mutate(
            v=Measurement.get("m", "value"), e=Measurement.get("m", "error")
        ).collect()}
        assert rows == {1: (1.0, 0.1), 2: (2.0, 0.5)}

    def test_quadrature_error_propagation(self, spark):
        # lift2: value adds, error adds in quadrature (the Measurement
        # semantics the reference gets from the measuremancer library)
        d = to_df({"id": [1]}, spark).mutate(
            a=Measurement.build(3.0, 0.3), b=Measurement.build(4.0, 0.4)
        )
        s = d.mutate(
            tot=Measurement.lift2(
                "a", "b", lambda x, y: x + y,
                error=lambda x, y: F.sqrt(x * x + y * y),
            )
        )
        r = s.mutate(
            v=Measurement.get("tot", "value"), e=Measurement.get("tot", "error")
        ).collect()[0]
        assert r["v"] == 7.0 and r["e"] == pytest.approx(0.5)

    def test_with_field_update(self, spark):
        d = to_df({"id": [1]}, spark).mutate(m=Measurement.build(2.0, 0.2))
        u = d.mutate(m=Measurement.with_field("m", "error", 0.05))
        r = u.mutate(
            v=Measurement.get("m", "value"), e=Measurement.get("m", "error")
        ).collect()[0]
        assert r["v"] == 2.0 and r["e"] == 0.05

    def test_groups_and_aggregates(self, spark):
        # typed columns group/agg like any column (struct round-trip)
        d = to_df({"g": [1, 1, 2]}, spark).mutate(
            m=Measurement.build(F.col("g") * 1.0, 0.1)
        )
        agg = d.group_by("g").summarize(mx=F.max(Measurement.get("m", "value")))
        assert {r["g"]: r["mx"] for r in agg.collect()} == {1: 1.0, 2: 2.0}


class TestContract:
    def test_bad_construction_rejected(self, spark):
        with pytest.raises(ValueError):
            Measurement.build(1.0)                       # missing error
        with pytest.raises(ValueError):
            Measurement.build(1.0, 0.1, value=2.0)       # duplicate
        with pytest.raises(KeyError):
            Measurement.get(F.col("m"), "nope")
        with pytest.raises(ValueError):
            define_column_type("Empty", {})

    def test_validate_catches_layout_drift(self, spark):
        d = to_df({"id": [1]}, spark).mutate(
            m=F.struct(F.lit(1).alias("wrong"))
        )
        with pytest.raises(TypeError):
            Measurement.validate(d.df, "m")
        with pytest.raises(KeyError):
            Measurement.validate(d.df, "absent")

    def test_pure_catalyst_no_python(self, spark):
        d = to_df({"id": [1]}, spark).mutate(
            m=Measurement.build(F.col("id") * 1.0, 0.1)
        ).mutate(m=Measurement.map_value("m", lambda v: v * 3))
        plan = d.df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Arrow" not in plan
