"""The aggregate-hash adjudication path (VERDICT r8 #3).

compare_agghash() extends value adjudication past compare()'s
collect() bound: both engines compute an order-insensitive
(count, sum-of-60-bit-row-hashes) pair engine-side and ship ONE row
each. These tests prove the two properties that make it
adjudication-grade:

1. AGREEMENT — wherever the strict collect() compare passes, the
   aggregate hash passes too (same canonicalization semantics),
   across every supported output type: ints, strings, bools, dates,
   bit-exact doubles (pass-through AND computed), arrays.
2. SENSITIVITY — single-cell mutations the strict harness would
   catch also fork the hash: a 1-ulp double drift, a signed zero, a
   NULL vs value, a swapped string, a dropped row, a duplicated row.
   (The r7 wireframe red was a signed zero invisible to the then-
   lossy local harness; the hash must never reintroduce that hole.)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import compare, compare_agghash

SF = "/root/testdata/sf0.01"


# A compact zoo covering every canonical branch: NULLs, NaN, +/-Inf,
# signed zero, subnormal, full-precision pass-through doubles,
# unicode strings, empty/NULL-element arrays.
# NOTE: bare decimal literals (0.1, -0.0) parse as DECIMAL in DuckDB
# — 0.1+0.2 becomes exact 0.3 and -0.0 loses its sign BEFORE any
# double is involved. Every fractional literal here goes through an
# explicit string->DOUBLE cast so both engines compute on the same
# IEEE doubles (scientific notation like 1e25 already parses DOUBLE).
_ZOO_SQL = """
SELECT * FROM (VALUES
  (1,  CAST('0.1' AS DOUBLE) + CAST('0.2' AS DOUBLE), 'plain',  TRUE,  DATE '2024-02-29', [CAST('1.5' AS DOUBLE), CAST('-0.0' AS DOUBLE)]),
  (2,  CAST('-0.0' AS DOUBLE), '',       FALSE, DATE '1970-01-01', []),
  (3,  CAST('nan' AS DOUBLE),  NULL,     NULL,  NULL,              NULL),
  (4,  CAST('inf' AS DOUBLE),  'üñí©ode', TRUE, DATE '1969-12-31', [CAST('nan' AS DOUBLE)]),
  (5,  CAST('-inf' AS DOUBLE), 'a\x1fb', FALSE, DATE '2000-01-01', [CAST('0.0' AS DOUBLE)]),
  (6,  4.9e-324,               '0:',     TRUE,  DATE '2024-01-01', [1e25, 2.2250738585072014e-308]),
  (7,  NULL,                   'x',      TRUE,  DATE '2024-01-02', [NULL, CAST('3.25' AS DOUBLE)]),
  (8,  CAST('123456789.123456789' AS DOUBLE), 'x', TRUE, DATE '2024-01-02', [CAST('3.25' AS DOUBLE)])
) t(k, d, s, b, dt, arr)
"""


def _zoo_df(spark):
    rows = [
        (1, 0.1 + 0.2, "plain", True, "2024-02-29", [1.5, -0.0]),
        (2, -0.0, "", False, "1970-01-01", []),
        (3, float("nan"), None, None, None, None),
        (4, float("inf"), "üñí©ode", True, "1969-12-31", [float("nan")]),
        (5, float("-inf"), "a\x1fb", False, "2000-01-01", [0.0]),
        (6, 4.9e-324, "0:", True, "2024-01-01", [1e25, 2.2250738585072014e-308]),
        (7, None, "x", True, "2024-01-02", [None, 3.25]),
        (8, 123456789.123456789, "x", True, "2024-01-02", [3.25]),
    ]
    df = spark.createDataFrame(
        rows, "k int, d double, s string, b boolean, dt string, arr array<double>"
    )
    return df.withColumn("dt", F.col("dt").cast("date"))


def test_agghash_agrees_with_strict_on_type_zoo(spark):
    df = _zoo_df(spark)
    r = compare_agghash(df, _ZOO_SQL, SF, "type_zoo")
    assert r["rows"] == 8 and r["hash"] is not None


def test_agghash_agrees_where_strict_passes(spark):
    # real registered queries spanning pass-through doubles
    # (box_filter), computed rounded doubles (rescale), arrays
    # (array_functions), strings+ints (paragraph dedup)
    from kittispark import registry as reg

    qs, osql = reg.queries(), reg.oracle_sql()
    for name in (
        "box_filter_conjunctive",
        "rescale_by_percentile",
        "array_functions",
        "paragraph_global_dedup",
    ):
        compare(qs[name](spark, SF), osql[name], SF, name)
        compare_agghash(qs[name](spark, SF), osql[name], SF, name)


@pytest.mark.parametrize(
    "mutation",
    [
        # (label, SQL mutation of the zoo feeding the DUCK side only)
        ("ulp_drift", "UPDATE_D_WHERE_K1"),
        ("signed_zero_flip", "FLIP_ZERO_K2"),
        ("null_vs_value", "NULL_D_K8"),
        ("string_swap", "SWAP_S_K7"),
        ("dropped_row", "DROP_K5"),
        ("duplicated_row", "DUP_K5"),
        ("array_elem_sign_zero", "FLIP_ARR_K1"),
    ],
)
def test_agghash_catches_single_cell_forks(spark, mutation):
    label, kind = mutation
    mutated = {
        # nextafter(0.3000...04, inf): a 1-ulp drift on k=1's d
        "UPDATE_D_WHERE_K1": _ZOO_SQL.replace(
            "CAST('0.1' AS DOUBLE) + CAST('0.2' AS DOUBLE)",
            "CAST('0.30000000000000010' AS DOUBLE)",
        ),
        "FLIP_ZERO_K2": _ZOO_SQL.replace(
            "(2,  CAST('-0.0' AS DOUBLE),", "(2,  CAST('0.0' AS DOUBLE),"
        ),
        "NULL_D_K8": _ZOO_SQL.replace(
            "(8,  CAST('123456789.123456789' AS DOUBLE),", "(8,  NULL,"
        ),
        "SWAP_S_K7": _ZOO_SQL.replace(
            "(7,  NULL,                   'x',", "(7,  NULL,                   'y',"
        ),
        "DROP_K5": _ZOO_SQL.replace(
            "  (5,  CAST('-inf' AS DOUBLE), 'a\x1fb', FALSE, DATE '2000-01-01', [CAST('0.0' AS DOUBLE)]),\n",
            "",
        ),
        "DUP_K5": _ZOO_SQL.replace(
            ") t(k, d, s, b, dt, arr)",
            ", (5,  CAST('-inf' AS DOUBLE), 'a\x1fb', FALSE, DATE '2000-01-01', [CAST('0.0' AS DOUBLE)])) t(k, d, s, b, dt, arr)",
        ),
        "FLIP_ARR_K1": _ZOO_SQL.replace(
            "[CAST('1.5' AS DOUBLE), CAST('-0.0' AS DOUBLE)]",
            "[CAST('1.5' AS DOUBLE), CAST('0.0' AS DOUBLE)]",
        ),
    }[kind]
    assert mutated != _ZOO_SQL, f"mutation {label} did not apply"
    with pytest.raises(AssertionError):
        compare_agghash(_zoo_df(spark), mutated, SF, label)


def test_agghash_ulp_drift_really_is_one_ulp():
    # the drift injected above must be the smallest representable
    # step, or the sensitivity test overstates itself
    a = 0.1 + 0.2
    b = float("0.30000000000000010")
    assert a != b and b == math.nextafter(a, math.inf)


def _bit_canon_reference(x: float) -> str:
    # ground truth from the actual IEEE bits (via frexp, which is
    # exact): (sign)(53-bit mantissa int)p(unbiased exponent)
    if x == 0:
        return ("-" if math.copysign(1, x) < 0 else "") + "0p0"
    m, e = math.frexp(abs(x))
    return ("-" if x < 0 else "") + f"{int(m * 2**53)}p{e - 1}"


def _adversarial_doubles():
    import random
    import struct

    vals = [
        0.0, -0.0, 1.0, -1.0, 2.0, 0.5, 1.5, 0.1, 0.2, 0.3, 1e25, -1e25,
        1e-5, 4.9e-324, -4.9e-324, 2.2250738585072014e-308,
        2.225073858507201e-308, 1.7976931348623157e308,
        -1.7976931348623157e308, 3.141592653589793,
        math.nextafter(1.0, 2), math.nextafter(1.0, 0),
        math.nextafter(2.0, 0), math.nextafter(2.0, 3), 8.0,
        math.nextafter(8.0, 0), 1024.0, 2.0**-1022,
        math.nextafter(2.0**-1022, 0), 123456789.123456789, 2.0**52,
        2.0**53, 2.0**53 - 1, 6.62607015e-34,
    ]
    rnd = random.Random(7)
    # random finite bit patterns (mask the exponent below all-ones)
    for _ in range(2000):
        bits = rnd.getrandbits(64) & 0x7FEFFFFFFFFFFFFF | (rnd.getrandbits(1) << 63)
        vals.append(struct.unpack("<d", struct.pack("<Q", bits))[0])
    return [v for v in vals if not (math.isnan(v) or math.isinf(v))]


def test_native_double_canonical_matches_ieee_bits_spark(spark):
    from pyspark.sql import functions as F

    from tests.oracle_harness import _dbl_canon_spark

    vals = _adversarial_doubles()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select("x", F.expr(_dbl_canon_spark("`x`")).alias("c")).collect()
    for r in rows:
        assert r.c == _bit_canon_reference(r.x), repr(r.x)


def test_native_double_canonical_matches_ieee_bits_duck():
    import duckdb

    from tests.oracle_harness import _dbl_canon_duck

    vals = _adversarial_doubles()
    con = duckdb.connect()
    con.execute("CREATE TABLE v(x DOUBLE)")
    con.executemany("INSERT INTO v VALUES (?)", [(v,) for v in vals])
    for x, c in con.execute(f"SELECT x, {_dbl_canon_duck('x')} FROM v").fetchall():
        assert c == _bit_canon_reference(x), repr(x)


def test_agghash_empty_result(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    r = compare_agghash(df, "SELECT 1 AS k WHERE false", SF, "empty")
    assert r == {"rows": 0, "hash": None, "hash2": None}
