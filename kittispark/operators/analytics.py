"""Reusable analytics operators: gap-fill, intra-doc chunk dedup,
PPS systematic sampling, and declarative PageRank.

Library forms of the ``queries/analytics_ext.py`` registry entries —
parameterized over column names / k / iteration count so they can be
unit-tested on constructed inputs and reused outside the fixture
schema. Float/int determinism contracts are documented per function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from kittispark.operators.util import materialize, release


def gapfill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key calendar densification with forward fill.

    Aggregates ``value_col`` to exact-cents daily sums per key, then
    explodes each key's [first active day, last active day] span onto
    a contiguous date spine and forward-fills gap days with the last
    observed value. The fill is the count-partition trick (running
    count of non-nulls defines a fill group; max within the group is
    the carried value) — plain ANSI window composition with no
    IGNORE NULLS dependence, so any SQL engine replays it bit-exactly.

    Scale: every window partitions by the key; the spine explode is
    bounded by each key's own span. No global window, no driver
    collection.

    Output: (key, day 'yyyy-MM-dd', filled_value double, is_gap bool).
    """
    daily = df.groupBy(
        key_col, F.to_date(ts_col).alias("day")
    ).agg(
        F.sum(F.round(F.col(value_col) * 100, 0).cast("long")).alias("day_cents")
    )
    span = daily.groupBy(key_col).agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    spine = span.select(
        key_col,
        F.explode(
            F.sequence("dmin", "dmax", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = spine.join(daily, [key_col, "day"], "left")
    w_run = (
        W.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    staged = joined.withColumn("grp", F.count("day_cents").over(w_run))
    return staged.select(
        key_col,
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (
            F.max("day_cents").over(W.partitionBy(key_col, "grp")).cast("double")
            / 100
        ).alias("filled_value"),
        F.col("day_cents").isNull().alias("is_gap"),
    )


def _ordered_reassemble(pos_col: str, part_col: str, sep: str) -> Column:
    """collect_list(struct(pos, part)) -> array_sort -> join: the
    order-restoring aggregation idiom (collect_list order is
    task-nondeterministic; the struct sort makes it deterministic)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(pos_col, part_col))),
            lambda x: x[part_col],
        ),
        sep,
    )


def dedup_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
) -> DataFrame:
    """Remove repeated ``chunk_words``-word chunks WITHIN each
    document, preserving first-occurrence order (C4/Dolma-style
    intra-doc boilerplate removal). Documents shorter than one chunk
    pass through verbatim (their single partial chunk is trivially
    first). Embarrassingly document-parallel: every shuffle is keyed
    by (doc, chunk-position or chunk-text) — no corpus-wide state.

    Output: (id, clean_text, n_chunks, n_kept).

    Plan note (measured, not guessed): chunks are built by word
    posexplode + (doc, chunk-id) groupBy. The tempting "map-side"
    alternative — transform(sequence(..), i -> array_join(slice(
    words, ..))) — avoids the word-level shuffle but re-triggers the
    HOF-lambda inlining pitfall (shingle_rows docstring): Catalyst's
    projection collapse substitutes the split() INTO the lambda, so
    every chunk re-tokenizes the document — measured 3x slower at
    sf0.1 (0.33 s -> 0.98 s) despite the smaller shuffle. The word
    shuffle partitions by doc_id, which the downstream dedup
    aggregations reuse.
    """
    words = df.select(
        id_col, F.posexplode(F.split(text_col, " ")).alias("pos", "w")
    )
    chunks = words.groupBy(
        id_col, (F.col("pos") / chunk_words).cast("int").alias("cid")
    ).agg(_ordered_reassemble("pos", "w", " ").alias("chunk"))
    firsts = chunks.groupBy(id_col, "chunk").agg(F.min("cid").alias("keep_cid"))
    stats = chunks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    return (
        firsts.groupBy(id_col)
        .agg(
            _ordered_reassemble("keep_cid", "chunk", " ").alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .join(stats, id_col)
        .select(id_col, "clean_text", "n_chunks", "n_kept")
    )


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    bucket_size: int = 256,
) -> DataFrame:
    """Deterministic probability-proportional-to-size systematic
    sampling: lay items on [0, total_weight) in id order and pick the
    item covering each multiple of total/k. Entirely int64 — the
    crossing test is an integer-DIV inequality, so any engine selects
    the identical sample and total picks is EXACTLY k (the k
    boundaries partition the weight line; items heavier than total/k
    earn multiple picks).

    The prefix sum is two-level: running sums within id-range buckets
    plus a running offset over the (tiny) bucket-total table — never
    one global window over the data.

    Output: (id, w long, picks long) for picked items only.
    """
    wt = df.select(
        id_col,
        F.col(weight_col).cast("long").alias("w"),
        (F.col(id_col) / bucket_size).cast("long").alias("bucket"),
    )
    btot = wt.groupBy("bucket").agg(F.sum("w").alias("bw"))
    w_b = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    boff = btot.select(
        F.col("bucket").alias("obucket"),
        (F.sum("bw").over(w_b) - F.col("bw")).alias("offset"),
    )
    total = wt.agg(F.sum("w").alias("total"))
    w_in = (
        W.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = wt.join(F.broadcast(boff), F.col("bucket") == F.col("obucket")).select(
        id_col, "w", (F.col("offset") + F.sum("w").over(w_in)).alias("c")
    )
    hi = F.expr(f"(c * {int(k)}) DIV total")
    lo = F.expr(f"((c - w) * {int(k)}) DIV total")
    return (
        cum.crossJoin(F.broadcast(total))
        .filter(hi > lo)
        .select(id_col, "w", (hi - lo).alias("picks"))
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """Damped PageRank power iteration, fully declarative: each
    iteration is one aggregation over the weighted edge list — a
    Python loop builds the plan, nothing executes per-iteration on
    the driver. ``edges`` must have (src, dst, w); ``nodes`` a single
    ``node`` column (n rows). Edge weights normalize to out-fractions
    once; nodes without in-edges keep the teleport base. Lost mass
    from dangling nodes (no out-edges) is dropped, the simplified-PR
    convention — document it when comparing engines.

    Ranks are O(1/n)-magnitude doubles; per-node contribution sums
    have summation-order freedom, so emit round(.., 6) when
    hash-comparing across engines.

    Output: (node, pr double) after ``iters`` iterations.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    n = nodes.count()  # metadata-scale scalar (node set is small)
    # localCheckpoint (the connected_components idiom) truncates the
    # lineage: without it iteration i's plan REPLAYS the whole edge
    # aggregation and every earlier iteration — plan size doubles per
    # round (30 parquet scans by iteration 2, measured) and the fact
    # table would be re-scanned 2^iters times.
    frac = materialize(pagerank_fractions(edges))
    pr = nodes.select("node", (F.lit(1.0) / n).alias("pr"))
    for _ in range(iters):
        prev_pr = pr
        pr = materialize(pagerank_step(nodes, frac, pr, n, damping))
        release(prev_pr)  # dead round (no-op round 1: unmaterialized)
    release(frac)  # the final pr is pinned; the fraction table is done
    return pr


def pagerank_fractions(edges: DataFrame) -> DataFrame:
    """Normalize (src, dst, w) edge weights to per-src out-fractions —
    the one-time graph materialization every iteration reuses.

    The out-weight and rank tables are one row per NODE, so neither
    this join nor pagerank_step's hints a broadcast (the grouped_rank
    lesson, ADVICE r6): a forced broadcast fails outright on a
    billion-node graph, while the planner (AQE at runtime) broadcasts
    automatically whenever the node table is actually small — which
    is every current consumer."""
    outw = edges.groupBy(F.col("src").alias("osrc")).agg(F.sum("w").alias("ow"))
    return edges.join(outw, F.col("src") == F.col("osrc")).select(
        "src",
        "dst",
        (F.col("w").cast("double") / F.col("ow").cast("double")).alias("f"),
    )


def pagerank_step(
    nodes: DataFrame,
    frac: DataFrame,
    prev: DataFrame,
    n: int,
    damping: float = 0.85,
) -> DataFrame:
    """One damped power-iteration step: pr'(v) = (1-d)/n + d *
    sum over in-edges of f(u,v) * pr(u). ``prev`` must be
    (node, pr); nodes without in-edges keep the teleport base."""
    base = F.lit(1.0 - damping) / n
    return (
        nodes.join(frac, F.col("dst") == F.col("node"), "left")
        .join(
            # per-node rank table: planner's choice, no forced
            # broadcast (see pagerank_fractions)
            prev.select(
                F.col("node").alias("pnode"), F.col("pr").alias("src_pr")
            ),
            F.col("src") == F.col("pnode"),
            "left",
        )
        .groupBy("node")
        .agg(
            (
                base
                + F.lit(damping)
                * F.coalesce(F.sum(F.col("f") * F.col("src_pr")), F.lit(0.0))
            ).alias("pr")
        )
    )


def global_rank(
    df: DataFrame,
    *order_cols: Column,
    out_col: str = "rank",
    partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Exact global row_number over a total order WITHOUT a
    single-partition window: repartitionByRange places partition i's
    keys entirely before partition i+1's, per-partition row_number
    runs in parallel, and a running offset over the (tiny)
    partition-size table lifts local numbers to global ranks — the
    same two-level prefix-sum shape as pps_systematic_sample. The
    order must be total (include a unique tiebreak column) for the
    rank to be deterministic.

    ``total_col``: also attach the TOTAL row count to every row, for
    free — it falls out of the same partition-size table the offsets
    come from, so consumers that need n (closed-form ntile, percent
    rank) avoid a second aggregation pass over the data.
    """
    parts = df.repartitionByRange(
        *( [partitions] if partitions else [] ), *order_cols
    )
    w_local = W.partitionBy("__pid").orderBy(*order_cols)
    # MATERIALIZE the pid-stamped table: `local` feeds BOTH the
    # size/offset table and the rank join, and without a checkpoint
    # the two consumers can materialize the range exchange under
    # DIFFERENT AQE partition coalescings (the exchange has no
    # user-fixed partition count, so AQE may merge post-shuffle
    # partitions differently per stage instance) — then __pid in
    # `offs` no longer describes __pid in the join side: the inner
    # join silently DROPS rows whose pid vanished and mis-offsets
    # the rest. Invisible at gate scale (one coalesced partition);
    # at 250k rows x 8 cores it fired on 3 of 5 runs. The
    # materialization freezes one partitioning that both consumers
    # read. HOW it is pinned is deployment policy (ADVICE r6): the
    # default localCheckpoint is executor-local storage — fastest,
    # but an executor loss afterwards is unrecoverable; set
    # kittispark.materialize.mode=persist_disk (lineage kept) for
    # fault-sensitive clusters — see operators/util.materialize.
    # (A third option — pinning an explicit partition count on the
    # repartitionByRange, which disables AQE coalescing for that
    # exchange — avoids materialization entirely but gives up AQE's
    # right-sizing; we keep AQE and pin the result instead.)
    local = materialize(
        parts.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
    )
    sizes = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    offs = sizes.select(
        F.col("__pid").alias("__opid"),
        (F.sum("__n").over(w_off) - F.col("__n")).alias("__off"),
        F.sum("__n").over(w_all).alias("__tot"),
    )
    out = (
        local.join(F.broadcast(offs), F.col("__pid") == F.col("__opid"))
        .withColumn(out_col, F.col("__off") + F.col("__lr"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__tot"))
    return out.drop("__pid", "__lr", "__opid", "__off", "__tot")


def _exact_div(a: Column, b: Column) -> Column:
    """Integer floor division for non-negative int64 columns, exact
    below 2^53: subtracting a % b first makes the double division
    land on an exact integer (plain long/long -> double followed by
    a truncating cast can mis-round at quotient boundaries)."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, n_rows: Column, k: int) -> Column:
    """Closed-form SQL-standard ntile(k) from an exact 1-based rank
    and the total row count: the first (n mod k) buckets hold
    floor(n/k)+1 rows each, the rest floor(n/k). Pure integer
    arithmetic — replays bit-identically in any engine, unlike a
    second window. greatest(base, 1) guards the n < k case (where
    the first branch always applies)."""
    n = n_rows.cast("long")
    base = _exact_div(n, F.lit(k).cast("long"))
    rem = n % k
    big_span = (base + 1) * rem
    return (
        F.when(rank <= big_span, _exact_div(rank - 1, base + 1) + 1)
        .otherwise(
            rem
            + _exact_div(rank - 1 - big_span, F.greatest(base, F.lit(1).cast("long")))
            + 1
        )
        .cast("int")
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    *tiebreak_cols: str,
    out_col: str = "wmedian",
    total_weight_col: str = "total_weight",
    n_rows_col: str = "n_rows",
) -> DataFrame:
    """Lower weighted median of ``value_col`` per group, weighted by
    ``weight_col``: the smallest value whose cumulative weight reaches
    half the group total (2*cum >= tot — kept in the inputs'
    arithmetic, exact whenever weights are integral; weights must be
    positive or the cumulative-crossing rule is meaningless).

    Output schema (the full contract — ADVICE r4 made the side
    columns explicit): ``group_col``, ``out_col`` (the median),
    ``total_weight_col`` (the group's total weight — the window
    already paid for it, callers invariably want it), and
    ``n_rows_col`` (group row count).

    One group-partitioned ordered window computes the cumulative
    weight; the group's shuffle is reused by the final agg, so the
    whole operator costs ONE Exchange. The order must be totalized
    via ``tiebreak_cols`` for a deterministic cumulative sequence
    (ties in value cannot change the answer — every tied row carries
    the same value — but determinism keeps cross-engine replays
    exact). Group keys should be high-cardinality for parallelism;
    for a few huge groups, rank with global_rank per group instead."""
    w_cum = (
        W.partitionBy(group_col)
        .orderBy(value_col, *tiebreak_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy(group_col).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    c = df.select(
        group_col,
        value_col,
        F.sum(weight_col).over(w_cum).alias("__cum_w"),
        F.sum(weight_col).over(w_all).alias("__tot_w"),
    )
    return c.groupBy(group_col).agg(
        F.min(
            F.when(2 * F.col("__cum_w") >= F.col("__tot_w"), F.col(value_col))
        ).alias(out_col),
        F.max("__tot_w").alias(total_weight_col),
        F.count(F.lit(1)).alias(n_rows_col),
    )


def global_cumsum(
    df: DataFrame,
    value_col: str | Column,
    *order_cols: Column,
    out_col: str = "cum_before",
    partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running sum of ``value_col`` over a total order,
    without a single-partition window — the same two-level
    prefix-sum shape as global_rank: range-repartition so partition
    i's keys all precede partition i+1's, per-partition exclusive
    cumsum in parallel, then lift by a broadcast running offset over
    the (tiny, one row per partition) partial-sum table. The order
    must be total (include a unique tiebreak) for determinism.

    Exclusive (sum of strictly-preceding rows, 0 for the first) is
    the planning-friendly form: bin-by-cumulative-size assignments
    ``floor(cum_before / target)`` put a row in the bin its START
    offset falls in."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    parts = df.repartitionByRange(
        *([partitions] if partitions else []), *order_cols
    )
    w_local = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # same double-consumption hazard as global_rank (see the
    # checkpoint comment there): freeze ONE pid assignment for both
    # the partial-sum table and the join side.
    local = materialize(
        parts.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lc", F.coalesce(F.sum(val).over(w_local), F.lit(0)))
    )
    sizes = local.groupBy("__pid").agg(F.sum(val).alias("__s"))
    w_off = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offs = sizes.select(
        F.col("__pid").alias("__opid"),
        F.coalesce(F.sum("__s").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offs), F.col("__pid") == F.col("__opid"))
        .withColumn(out_col, F.col("__off") + F.col("__lc"))
        .drop("__pid", "__lc", "__opid", "__off")
    )


def grouped_rank(
    df: DataFrame,
    group_cols: list[str],
    *order_cols: Column,
    out_col: str = "rank",
    total_col: str = "n_group",
) -> DataFrame:
    """Exact PER-GROUP row_number over a total order WITHOUT a
    per-group single-partition window: the group-key generalization
    of global_rank. repartitionByRange on (group, order) places each
    group's keys in contiguous order across partitions; the local
    window partitions by (partition, group) and runs in parallel
    regardless of how large any one group is; the offset/total
    table is (partitions x groups) rows — its window is over
    partition ids, never data. Order must be total within a group
    (include a unique tiebreak) for determinism. Attaches the group
    total in ``total_col`` for free.

    The offset-table join is NOT broadcast-hinted (ADVICE r6): the
    table is (shuffle partitions x distinct groups) rows, so a
    high-cardinality group key could exceed the broadcast limit; the
    planner (AQE at runtime) broadcasts it automatically whenever it
    is actually small, and falls back to a shuffle join when not —
    both correct here."""
    parts = df.repartitionByRange(*group_cols, *order_cols)
    w_local = W.partitionBy("__pid", *group_cols).orderBy(*order_cols)
    # same double-consumption hazard as global_rank (see the
    # checkpoint comment there): freeze ONE pid assignment for both
    # the offset table and the join side.
    local = materialize(
        parts.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
    )
    sizes = local.groupBy("__pid", *group_cols).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        W.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy(*group_cols).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offs = sizes.select(
        F.col("__pid").alias("__opid"),
        *[F.col(g).alias(f"__og_{g}") for g in group_cols],
        (F.sum("__n").over(w_off) - F.col("__n")).alias("__off"),
        F.sum("__n").over(w_all).alias("__tot"),
    )
    cond = F.col("__pid") == F.col("__opid")
    for g in group_cols:
        cond = cond & F.col(g).eqNullSafe(F.col(f"__og_{g}"))
    return (
        local.join(offs, cond)
        .withColumn(out_col, F.col("__off") + F.col("__lr"))
        .withColumn(total_col, F.col("__tot"))
        .drop(
            "__pid",
            "__lr",
            "__opid",
            "__off",
            "__tot",
            *[f"__og_{g}" for g in group_cols],
        )
    )
