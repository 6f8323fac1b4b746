"""Bloom-filter join pruning invariants.

The operator's contract is exactness-by-construction (superset
filter + exact confirm), which the oracle-parity test already checks
end to end. These tests pin the two properties parity can miss:

1. NO FALSE NEGATIVES in the filter itself — every build key must
   pass the probe. (The r3 bitmap rewrite briefly violated this for
   words with bit 63 set: shiftrightunsigned keeps the sign bit
   in-value and `% 2` takes the dividend sign, so odd negative words
   tested as missing. A `% 2`-style regression flips ~1/128 of keys
   to false negatives, which this sweep catches deterministically.)
2. The pruned semi-join equals the plain semi-join row-for-row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kittispark.operators.bloom import (
    _might_contain,
    bloom_filter_build,
    bloom_pruned_semi_join,
)


def test_no_false_negatives_dense_key_sweep(spark):
    # 20k consecutive keys: bit positions cover words densely, so
    # every word index and bit position class (incl. bit 63) occurs.
    keys = spark.range(0, 20_000).select(F.col("id").alias("k"))
    m, k = 1 << 14, 3  # small m -> every word heavily populated
    bits = bloom_filter_build(keys, "k", m, k)
    probed = keys.crossJoin(F.broadcast(bits)).filter(
        ~_might_contain(F.col("k"), m, k)
    )
    assert probed.count() == 0, "build key failed its own membership probe"


def test_pruned_semi_join_equals_plain_semi_join(spark):
    probe = spark.range(0, 5_000).select((F.col("id") * 7 % 4096).alias("key"))
    build = spark.range(0, 600).select((F.col("id") * 13 % 2048).alias("bkey"))
    got = (
        bloom_pruned_semi_join(probe, build, "key", "bkey", m=1 << 12, k=2)
        .groupBy("key")
        .count()
    )
    want = (
        probe.join(build.select(F.col("bkey").alias("key")).distinct(), "key", "left_semi")
        .groupBy("key")
        .count()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
