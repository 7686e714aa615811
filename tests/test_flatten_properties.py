"""Property-based tests (hypothesis) for the flatten metadata algorithm
— pure StructType manipulation, no Spark jobs, so hundreds of examples
run in milliseconds. Invariants pinned:

1. every output name is the LEAF segment of some input path;
2. no duplicate output names (keep-first dedup);
3. first occurrence wins, in depth-first declaration order;
4. determinism: same schema → same output, always;
5. `drop` policy: no array-typed leaf survives.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from ytspark.flatten import flat_column_names, flatten_fields

_NAMES = st.sampled_from(
    ["id", "title", "url", "count", "meta", "x", "y", "localized", "stats"]
)

_SCALARS = st.sampled_from(
    [T.StringType(), T.LongType(), T.BooleanType(), T.DoubleType()]
)


def _leaf_types():
    return st.one_of(
        _SCALARS, _SCALARS.map(lambda t: T.ArrayType(t))
    )


def _struct_types(depth: int):
    if depth == 0:
        return _leaf_types()
    return st.one_of(
        _leaf_types(),
        st.lists(
            st.tuples(_NAMES, _struct_types(depth - 1)),
            min_size=1,
            max_size=4,
            unique_by=lambda kv: kv[0],
        ).map(lambda kvs: T.StructType([T.StructField(k, v) for k, v in kvs])),
    )


SCHEMAS = st.lists(
    st.tuples(_NAMES, _struct_types(2)),
    min_size=1,
    max_size=5,
    unique_by=lambda kv: kv[0],
).map(lambda kvs: T.StructType([T.StructField(k, v) for k, v in kvs]))


@settings(max_examples=200, deadline=None)
@given(SCHEMAS)
def test_names_are_leaves_and_unique(schema):
    fields = flatten_fields(schema)
    leaves = {f.leaf for f in fields}
    names = flat_column_names(schema, list_policy="drop")
    assert len(names) == len(set(names))  # no duplicates ever
    assert set(names) <= leaves  # every name is a real leaf segment


@settings(max_examples=200, deadline=None)
@given(SCHEMAS)
def test_first_occurrence_wins_in_depth_first_order(schema):
    fields = [
        f for f in flatten_fields(schema)
        if not isinstance(f.dtype, T.ArrayType)
    ]
    expected, seen = [], set()
    for f in fields:  # flatten_fields is depth-first declaration order
        if f.leaf not in seen:
            seen.add(f.leaf)
            expected.append(f.leaf)
    assert flat_column_names(schema, list_policy="drop") == expected


@settings(max_examples=100, deadline=None)
@given(SCHEMAS)
def test_deterministic(schema):
    assert flat_column_names(schema) == flat_column_names(schema)
    assert flatten_fields(schema) == flatten_fields(schema)


@settings(max_examples=100, deadline=None)
@given(SCHEMAS)
def test_drop_policy_drops_all_arrays(schema):
    names = set(flat_column_names(schema, list_policy="drop"))
    array_only_leaves = {
        f.leaf for f in flatten_fields(schema) if isinstance(f.dtype, T.ArrayType)
    } - {
        f.leaf for f in flatten_fields(schema)
        if not isinstance(f.dtype, T.ArrayType)
    }
    assert names & array_only_leaves == set()


@settings(max_examples=100, deadline=None)
@given(SCHEMAS, st.integers(min_value=1, max_value=4))
def test_positional_policy_emits_width_columns(schema, width):
    names = flat_column_names(schema, list_policy="positional", list_width=width)
    assert len(names) == len(set(names))
    has_array = any(
        isinstance(f.dtype, T.ArrayType) for f in flatten_fields(schema)
    )
    if has_array:
        assert any("_0" in n for n in names)
