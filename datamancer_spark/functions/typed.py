"""User-defined typed struct columns — the runnable twin of the
reference's ``defColumn``/``colGeneric`` user column types
(``/root/reference/src/datamancer/column.nim:207-224``, exercised in
``playground/non_generic_generics.nim:22-40`` with a ``KiloGram`` unit
type and a ``Measurement[float]`` value±error type).

Spark-first mapping: a user column type is a STRUCT column whose field
layout is declared once via :func:`define_column_type`. The returned
:class:`ColumnType` carries constructor, field access, per-field update,
and arithmetic passthrough on the primary field — all pure Catalyst
expressions (``named_struct``/``getField``/``withField``), so typed
columns run in whole-stage codegen, group/agg/join like any column, and
need no engine extension (unlike the reference, where each new type
instantiates a Nim macro variant of the Column sum type).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ColumnType:
    """A declared struct layout: ordered ``{field: spark_type_ddl}``.

    The FIRST declared field is the *primary* field — the one unit-style
    wrappers (``KiloGram``) hold their value in and the one
    :meth:`map_value` / :meth:`lift2` route arithmetic through.
    """

    def __init__(self, name: str, fields: Mapping[str, str]):
        if not fields:
            raise ValueError(f"ColumnType {name!r}: need at least one field")
        self.name = name
        self.fields = dict(fields)
        self._primary = next(iter(self.fields))

    # -- construct ----------------------------------------------------------
    def build(self, *args, **kwargs) -> Column:
        """Construct a typed struct column. Positional args bind to the
        declared field order; keywords bind by name. Values may be
        Columns or Python literals; each is cast to the declared type so
        the struct layout is stable across call sites (int literals in a
        double field, etc.)."""
        vals = dict(zip(self.fields, args))
        overlap = vals.keys() & kwargs.keys()
        if overlap:
            raise ValueError(f"{self.name}: duplicate fields {sorted(overlap)}")
        vals.update(kwargs)
        missing = self.fields.keys() - vals.keys()
        extra = vals.keys() - self.fields.keys()
        if missing or extra:
            raise ValueError(
                f"{self.name}: missing={sorted(missing)} unknown={sorted(extra)}"
            )
        cols = []
        for f, t in self.fields.items():
            v = vals[f]
            c = v if isinstance(v, Column) else F.lit(v)
            cols.append(c.cast(t).alias(f))
        return F.struct(*cols)

    # -- access -------------------------------------------------------------
    def get(self, c: Column | str, field: str | None = None) -> Column:
        """Field accessor (default: the primary field) — the twin of the
        reference's ``c[0, KiloGram]`` typed indexing."""
        field = field or self._primary
        if field not in self.fields:
            raise KeyError(f"{self.name} has no field {field!r}")
        return F.col(c)[field] if isinstance(c, str) else c[field]

    value = get  # unit-type reading: KiloGram.value(col)

    # -- update -------------------------------------------------------------
    def with_field(self, c: Column | str, field: str, value) -> Column:
        """Rebuild the struct with one field replaced (``c[0] = 1.5.kg``
        twin); other fields are untouched."""
        if field not in self.fields:
            raise KeyError(f"{self.name} has no field {field!r}")
        base = F.col(c) if isinstance(c, str) else c
        v = value if isinstance(value, Column) else F.lit(value)
        return base.withField(field, v.cast(self.fields[field]))

    # -- arithmetic passthrough --------------------------------------------
    def map_value(
        self, c: Column | str, fn: Callable[[Column], Column]
    ) -> Column:
        """Apply ``fn`` to the primary field, preserving the struct and
        every other field — unit arithmetic (``kg * 2``) without
        unwrapping."""
        base = F.col(c) if isinstance(c, str) else c
        return base.withField(
            self._primary,
            fn(base[self._primary]).cast(self.fields[self._primary]),
        )

    def lift2(
        self,
        a: Column | str,
        b: Column | str,
        fn: Callable[[Column, Column], Column],
        **other_fields: Callable[[Column, Column], Column],
    ) -> Column:
        """Binary arithmetic between two typed columns: ``fn`` combines
        the primary fields; each keyword gives the combiner for another
        field (e.g. quadrature error propagation for ``Measurement``).
        Unspecified non-primary fields take the left operand's value."""
        ca = F.col(a) if isinstance(a, str) else a
        cb = F.col(b) if isinstance(b, str) else b
        vals: dict[str, Column] = {self._primary: fn(ca[self._primary], cb[self._primary])}
        for f, combiner in other_fields.items():
            if f not in self.fields or f == self._primary:
                raise KeyError(f"{self.name}: bad lift2 field {f!r}")
            vals[f] = combiner(ca[f], cb[f])
        for f in self.fields:
            if f not in vals:
                vals[f] = ca[f]
        return F.struct(
            *[vals[f].cast(t).alias(f) for f, t in self.fields.items()]
        )

    # -- schema -------------------------------------------------------------
    def ddl(self) -> str:
        """The struct DDL, for schema declarations and assertions."""
        inner = ",".join(f"{f}:{t}" for f, t in self.fields.items())
        return f"struct<{inner}>"

    def validate(self, df: DataFrame, col_name: str) -> None:
        """Assert ``col_name`` carries this layout (type-check at the
        API edge, where the reference gets it from the Nim compiler)."""
        actual = dict(df.dtypes).get(col_name)
        if actual is None:
            raise KeyError(f"no column {col_name!r}")
        if actual.replace(" ", "") != self.ddl():
            raise TypeError(
                f"{col_name!r} is {actual}, expected {self.name} = {self.ddl()}"
            )


def define_column_type(name: str, fields: Mapping[str, str] | str) -> ColumnType:
    """``defColumn`` twin: declare a user column type once, use it to
    construct/access/update typed struct columns anywhere.

    ``fields`` is an ordered mapping ``{field: spark_ddl_type}`` or a
    single DDL type string for unit-style single-value wrappers::

        KiloGram = define_column_type("KiloGram", "double")
        Measurement = define_column_type(
            "Measurement", {"value": "double", "error": "double"}
        )
    """
    if isinstance(fields, str):
        fields = {"value": fields}
    return ColumnType(name, fields)
