"""Binary (sign-bit) embedding quantization and Hamming-distance
search.

The scale play: a 64-dim float32 embedding (256 bytes) collapses to
64 sign bits (8 bytes) — a 32x densification that turns ANN candidate
generation into XOR+popcount over packed integer words, the same
trick binary-embedding serving stacks (faiss IndexBinaryFlat,
pgvector bit columns) use to scan billions of vectors per node.

Everything here is a whole-stage-codegen column expression:
- packing is a per-row ``aggregate`` fold over 32-element slices
  (map-side only — no explode, no shuffle, no Python);
- Hamming distance is ``bit_count(w_a ^ w_b)`` summed over words.

Words are 32-bit (stored in BIGINT) so no engine ever touches the
sign bit: DuckDB's ``1::BIGINT << 63`` and Spark's long shifts would
otherwise disagree on overflow, and a 32-bit little-endian word is
reproducible bit-for-bit in ANSI SQL on both engines.

Reference parity: the reference has no vector search at all (its
whole surface is kitti_utils.py's NumPy geometry); this family is
part of the LLM-data-pipeline extension mandated by SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def sign_word_expr(vec_col: str, word: int, word_bits: int = WORD_BITS) -> Column:
    """Little-endian sign-bit pack of ``vec_col[word*word_bits ..
    (word+1)*word_bits)`` into one BIGINT: bit i set iff the
    component is strictly positive. Pure expression fold — stays
    inside whole-stage codegen, no shuffle."""
    base = word * word_bits
    return F.expr(
        f"aggregate(sequence(0, {word_bits - 1}), 0L, (acc, i) -> "
        f"acc + IF(element_at({vec_col}, {base} + i + 1) > 0D, "
        f"shiftleft(1L, i), 0L))"
    )


def sign_pack(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    word_bits: int = WORD_BITS,
) -> DataFrame:
    """Append packed sign words ``w0..w{n-1}`` (dim/word_bits BIGINTs)
    and drop the float vector. Map-side only."""
    n_words = (dim + word_bits - 1) // word_bits
    cols = [c for c in df.columns if c != vec_col]
    return df.select(
        *cols,
        *[
            sign_word_expr(vec_col, w, word_bits).alias(f"w{w}")
            for w in range(n_words)
        ],
    )


def hamming_expr(n_words: int, left_prefix: str, right_prefix: str) -> Column:
    """Hamming distance between two packed-word rows:
    sum of popcount(xor) per word — integer-exact, order-free."""
    total = F.lit(0).cast("long")
    for w in range(n_words):
        total = total + F.bit_count(
            F.col(f"{left_prefix}w{w}").bitwiseXOR(F.col(f"{right_prefix}w{w}"))
        ).cast("long")
    return total


def hamming_topk(
    packed: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    n_words: int = 2,
    k: int = 5,
) -> DataFrame:
    """Exact Hamming top-k: broadcast the (small) packed query set,
    map-side XOR/popcount against every corpus row, per-query
    row_number window on (distance, neighbor_id).

    100 TB shape: the only shuffle is the per-query top-k window,
    keyed on query_id — corpus rows never shuffle; with Q queries the
    scan is one pass emitting Q rows per corpus row. For large Q,
    pre-reduce with a per-partition top-k before the window (same
    two-level pattern as operators.analytics.global_rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"w{w}").alias(f"q_w{w}") for w in range(n_words)],
    )
    c = packed.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(f"w{w}") for w in range(n_words)],
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            hamming_expr(n_words, "q_", "").alias("hamming"),
        )
    )
    from pyspark.sql.window import Window

    win = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(win).cast("int"))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.col("hamming").cast("long"), "rk")
    )
