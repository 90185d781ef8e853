"""Unit tests for the schema-evolution engine (SURVEY.md §2.4 E3-E6).

Mirrors the reference's unit suite (tests/unit/test_type_resolver.py,
test_bson_to_delta.py widening cases): numeric hierarchy, string fallback,
STRICT raises, list/struct recursion, compat validation, diff, and the
pre-write cast_to_schema projection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mongodb_cdc_delta_spark.schema import (
    MergeMode,
    SchemaEvolutionError,
    cast_to_schema,
    is_widening_safe,
    merge_schemas,
    merge_types,
    schema_diff,
    validate_schema_compatibility,
)


def s(*fields):
    return StructType([StructField(n, t, True) for n, t in fields])


class TestMergeTypes:
    def test_identical(self):
        assert merge_types(IntegerType(), IntegerType()) == IntegerType()

    def test_numeric_widening(self):
        assert merge_types(IntegerType(), LongType()) == LongType()
        assert merge_types(LongType(), IntegerType()) == LongType()
        assert merge_types(IntegerType(), DoubleType()) == DoubleType()
        assert merge_types(FloatType(), DoubleType()) == DoubleType()
        assert merge_types(LongType(), FloatType()) == FloatType()

    def test_null_yields_other(self):
        assert merge_types(NullType(), IntegerType()) == IntegerType()
        assert merge_types(StringType(), NullType()) == StringType()

    def test_conflict_falls_back_to_string(self):
        # reference bson_to_delta.py:256-263: incompatible -> string
        assert merge_types(BooleanType(), IntegerType()) == StringType()
        assert merge_types(TimestampType(), LongType()) == StringType()
        assert merge_types(IntegerType(), StringType()) == StringType()

    def test_strict_raises_on_widen(self):
        with pytest.raises(SchemaEvolutionError):
            merge_types(IntegerType(), LongType(), MergeMode.STRICT)

    def test_strict_raises_on_conflict(self):
        with pytest.raises(SchemaEvolutionError):
            merge_types(IntegerType(), StringType(), MergeMode.STRICT)

    def test_array_recursive(self):
        assert merge_types(
            ArrayType(IntegerType()), ArrayType(DoubleType())
        ) == ArrayType(DoubleType(), True)

    def test_struct_recursive(self):
        merged = merge_types(
            s(("a", IntegerType())), s(("a", LongType()), ("b", StringType()))
        )
        assert merged == s(("a", LongType()), ("b", StringType()))


class TestMergeSchemas:
    def test_union_preserves_table_order(self):
        merged = merge_schemas(
            s(("a", IntegerType()), ("b", StringType())),
            s(("c", DoubleType()), ("a", LongType())),
        )
        assert [f.name for f in merged.fields] == ["a", "b", "c"]
        assert merged["a"].dataType == LongType()

    def test_strict_allows_new_fields_only(self):
        merged = merge_schemas(
            s(("a", IntegerType())),
            s(("a", IntegerType()), ("b", StringType())),
            MergeMode.STRICT,
        )
        assert [f.name for f in merged.fields] == ["a", "b"]
        with pytest.raises(SchemaEvolutionError):
            merge_schemas(
                s(("a", IntegerType())), s(("a", StringType())), MergeMode.STRICT
            )


class TestCompat:
    def test_widening_safe(self):
        assert is_widening_safe(IntegerType(), LongType())
        assert not is_widening_safe(LongType(), IntegerType())
        assert is_widening_safe(IntegerType(), StringType())
        assert not is_widening_safe(LongType(), FloatType())

    def test_removed_field_flagged(self):
        issues = validate_schema_compatibility(
            s(("a", IntegerType()), ("b", StringType())), s(("a", IntegerType()))
        )
        assert issues == ["field removed: b"]
        assert not validate_schema_compatibility(
            s(("a", IntegerType()), ("b", StringType())),
            s(("a", IntegerType())),
            allow_field_removal=True,
        )

    def test_narrowing_flagged(self):
        issues = validate_schema_compatibility(
            s(("a", LongType())), s(("a", IntegerType()))
        )
        assert len(issues) == 1 and "incompatible" in issues[0]

    def test_diff(self):
        d = schema_diff(
            s(("a", IntegerType()), ("b", StringType())),
            s(("a", LongType()), ("c", DoubleType())),
        )
        assert d == {"added": ["c"], "removed": ["b"], "changed": ["a"]}


class TestCastToSchema:
    def test_missing_columns_null_and_widen(self, spark):
        df = spark.createDataFrame([Row(a=1, b="x")])
        target = s(("a", LongType()), ("b", StringType()), ("c", DoubleType()))
        out = cast_to_schema(df, target)
        assert out.schema == target
        row = out.collect()[0]
        assert (row.a, row.b, row.c) == (1, "x", None)

    def test_nested_struct_gains_field(self, spark):
        df = spark.createDataFrame(
            [Row(id=1, meta=Row(x=5))],
            schema=s(("id", IntegerType()), ("meta", s(("x", IntegerType())))),
        )
        target = s(
            ("id", LongType()),
            ("meta", s(("x", LongType()), ("y", StringType()))),
        )
        out = cast_to_schema(df, target)
        assert out.schema == target
        row = out.collect()[0]
        assert row.meta.x == 5 and row.meta.y is None

    def test_null_struct_stays_null(self, spark):
        schema = s(("id", IntegerType()), ("meta", s(("x", IntegerType()))))
        df = spark.createDataFrame([(1, None)], schema=schema)
        target = s(("id", IntegerType()), ("meta", s(("x", IntegerType()), ("y", StringType()))))
        assert cast_to_schema(df, target).collect()[0].meta is None

    def test_array_element_widen(self, spark):
        df = spark.createDataFrame(
            [Row(xs=[1, 2, 3])], schema=s(("xs", ArrayType(IntegerType())))
        )
        target = s(("xs", ArrayType(DoubleType(), True)))
        out = cast_to_schema(df, target)
        assert out.schema["xs"].dataType.elementType == DoubleType()
        assert out.collect()[0].xs == [1.0, 2.0, 3.0]

    def test_int_string_conflict_to_string(self, spark):
        # the known-hard case (SURVEY §7.3): long + string -> string
        df1 = spark.createDataFrame([Row(v=42)])
        merged = merge_types(df1.schema["v"].dataType, StringType())
        assert merged == StringType()
        out = cast_to_schema(df1, s(("v", StringType())))
        assert out.collect()[0].v == "42"
