"""Property-based tests (hypothesis) for the pure engine-level shims — an
upgrade over the reference's example-based unit tests (SURVEY.md §5)."""

from __future__ import annotations

from hypothesis import given, strategies as st
from pyspark.sql import types as T

from lakehouse_loader_spark.operators.dedup import MINHASH_PRIME, _hash_params
from lakehouse_loader_spark.sinks.alignment import SchemaAlignmentError, check_schema_aligned
from lakehouse_loader_spark.sinks.modes import WriteMode, WriteModeError, resolve_write_mode

_LEAF_TYPES = [
    T.LongType(),
    T.IntegerType(),
    T.DoubleType(),
    T.StringType(),
    T.BooleanType(),
    T.DateType(),
]

_field = st.tuples(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    st.sampled_from(_LEAF_TYPES),
    st.booleans(),
)


def _schema(fields) -> T.StructType:
    return T.StructType([T.StructField(n, t, nul) for n, t, nul in fields])


@given(st.lists(_field, min_size=1, max_size=6))
def test_alignment_reflexive(fields):
    """Every schema aligns with itself."""
    s = _schema(fields)
    check_schema_aligned(s, s)


@given(st.lists(_field, min_size=1, max_size=6), st.lists(st.text("xyz", min_size=1), min_size=0))
def test_alignment_rename_invariant(fields, _names):
    """Renaming every field never changes alignment (names are ignored)."""
    s = _schema(fields)
    renamed = T.StructType(
        [T.StructField(f"r{i}", f.dataType, f.nullable) for i, f in enumerate(s.fields)]
    )
    check_schema_aligned(renamed, s)


@given(st.lists(_field, min_size=1, max_size=6))
def test_alignment_tightening_nullability_is_ok_widening_is_not(fields):
    s = _schema(fields)
    required = T.StructType([T.StructField(f.name, f.dataType, False) for f in s.fields])
    nullable = T.StructType([T.StructField(f.name, f.dataType, True) for f in s.fields])
    check_schema_aligned(required, nullable)  # required → nullable: widen OK
    try:
        check_schema_aligned(nullable, required)
        assert all(not f.nullable for f in nullable.fields), (
            "nullable → required must raise unless there were no nullable fields"
        )
    except SchemaAlignmentError:
        pass


@given(st.lists(_field, min_size=2, max_size=6))
def test_alignment_field_count_mismatch_raises(fields):
    s = _schema(fields)
    shorter = T.StructType(s.fields[:-1])
    try:
        check_schema_aligned(shorter, s)
        raise AssertionError("expected SchemaAlignmentError")
    except SchemaAlignmentError:
        pass


@given(st.booleans(), st.booleans())
def test_mode_matrix_total(overwrite, append):
    """resolve_write_mode is total except exactly the (True, True) cell."""
    if overwrite and append:
        try:
            resolve_write_mode(overwrite, append)
            raise AssertionError("expected WriteModeError")
        except WriteModeError:
            pass
    else:
        assert isinstance(resolve_write_mode(overwrite, append), WriteMode)


@given(st.integers(min_value=1, max_value=256))
def test_minhash_params_in_field(n):
    """Affine permutation parameters stay inside the prime field and keep
    a != 0 (a degenerate a=0 would map every shingle to b)."""
    for a, b in _hash_params(n):
        assert 1 <= a < MINHASH_PRIME
        assert 0 <= b < MINHASH_PRIME
