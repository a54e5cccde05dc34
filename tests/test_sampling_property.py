"""Property fuzz of the deterministic-sampling contract, engine-side:
for ANY key/salt/fraction, the pure-Python bucket (hash_mod_py), the
DuckDB predicate (hash_sample_sql), and the cutoff arithmetic must agree
on membership — this is the cross-engine determinism the operators stake
their reproducibility claims on. (Spark-side equality is covered by
dedicated tests; fuzzing through a SparkSession per example would be
prohibitively slow, and the Spark expressions are tested equal to
hash_mod_py already.)"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quackpipe_spark.operators.sampling import (
    _BUCKETS,
    _cut,
    hash_mod_py,
    hash_sample_sql,
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


# printable-ish keys plus integers (the common id case); keys without
# quotes/backslashes ride the parameterized CAST, so they're unrestricted
# beyond what DuckDB string params accept
_keys = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(
        alphabet=st.characters(blacklist_characters="'\\", codec="utf-8"),
        min_size=0,
        max_size=40,
    ),
)
# quotes allowed (escaped into the SQL literal); control chars rejected by
# hash_sample_sql's validation, backslashes vary by SQL escape mode —
# exclude both here
_salts = st.text(
    alphabet=st.characters(
        blacklist_characters="\\", min_codepoint=0x20, codec="utf-8"
    ),
    max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(key=_keys, salt=_salts, fraction=st.floats(min_value=0.0, max_value=1.0))
def test_python_and_duckdb_agree_on_membership(con, key, salt, fraction):
    bucket = hash_mod_py(key, _BUCKETS, salt)
    py_keep = bucket < _cut(fraction)
    if isinstance(key, int):
        key_expr, params = "CAST(? AS BIGINT)", [key]
    else:
        key_expr, params = "CAST(? AS VARCHAR)", [key]
    duck_keep = con.execute(
        "SELECT " + hash_sample_sql(key_expr, fraction, salt), params
    ).fetchone()[0]
    assert duck_keep == py_keep, (key, salt, fraction, bucket)


@settings(max_examples=60, deadline=None)
@given(key=_keys, salt=_salts, f1=st.floats(0.0, 1.0), f2=st.floats(0.0, 1.0))
def test_fraction_nesting_property(key, salt, f1, f2):
    """Membership nests: kept at fraction f stays kept at any f' >= f."""
    lo, hi = sorted((f1, f2))
    bucket = hash_mod_py(key, _BUCKETS, salt)
    if bucket < _cut(lo):
        assert bucket < _cut(hi)
