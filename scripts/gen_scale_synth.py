"""Synthesize a larger scale factor from an existing testdata dir by
replicating the FACT tables k times with disjoint key ranges
(dimension tables are copied unchanged, so every join key still
resolves). This exists because the driver's testdata tops out at
sf0.1: the scaling audit (SCALING.md) needs a bigger step to separate
per-query fixed cost from the data-dependent term.

Key remapping keeps referential integrity where queries rely on it:
- lineitem.l_orderkey and orders.o_orderkey shift together by
  i * (max_orderkey + 1), so the orders<->lineitem join fans out
  correctly (each copy joins only its own copy);
- orders.o_custkey / lineitem part+supp keys are left as-is (they
  point into the unchanged dimension tables);
- events.event_id shifts by i * (max_id + 1); ts shifts by i days so
  window/sessionization queries see proportionally more buckets, and
  user_id is left as-is (same user population, k x denser activity).

Usage: python scripts/gen_scale_synth.py SRC_DIR DST_DIR K [--perturbed-docs]

--perturbed-docs (VERDICT r9 #3): plain clone replication makes every
document a TRUE near-dup of its k-1 clones, so ground-truth pair/edge
enumeration (minhash_lsh_recall, ngram_jaccard_pairs,
dedup_cluster_assign oracles) blows up ~quadratically in k — a fixture
artifact, not the operators' real-data shape. The perturbed mode
instead interleaves a (pair, source-doc)-scoped marker token between
every word of clones i >= 1: clones 2p-1 and 2p of a doc share marker
w{p}x{doc_id} and differ only in a trailing token (one true near-dup
pair), while every other clone pair shares NO 3-gram shingle at all
(every 3-token window contains a marker scoped to a different pair or
doc). True pair counts scale LINEARLY in k (~k/2 pairs per source
doc), clone clusters have size 2, and the shingle inverted index stays
sparse — organic-corpus shape at any k. Clone 0 keeps the original
text, so the base corpus's own near-dup structure is preserved once.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

COPY_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
)


def generate(src: str, dst: str, k: int, perturbed_docs: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    max_ok = con.execute(
        f"SELECT max(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
            SELECT o.* EXCLUDE (o_orderkey),
                   o.o_orderkey + i.range * {max_ok} AS o_orderkey
            FROM read_parquet('{src}/orders.parquet') o
            CROSS JOIN range({k}) i
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT l.* EXCLUDE (l_orderkey),
                   l.l_orderkey + i.range * {max_ok} AS l_orderkey
            FROM read_parquet('{src}/lineitem.parquet') l
            CROSS JOIN range({k}) i
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    # documents/embeddings are 500 rows at EVERY driver SF, so the
    # LLM-pipeline queries never see a scale step without this: each
    # copy appends a distinct token (docs become near- but not exact
    # duplicates across copies — the corpus shape near-dedup exists
    # for) and nudges the vector by a copy-specific epsilon (distinct
    # but clustered embeddings). n_chars is recomputed to stay true.
    max_doc = con.execute(
        f"SELECT max(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    if perturbed_docs:
        # see the module docstring: marker-interleaved clones so true
        # near-dup pair counts scale linearly in k
        text_expr = f"""
            CASE WHEN i.range = 0 THEN d.text
                 ELSE replace(d.text, ' ',
                      ' w' || ((i.range + 1) // 2) || 'x' || d.doc_id || ' ')
                      || ' c' || i.range
            END"""
    else:
        text_expr = "d.text || ' c' || i.range"
    con.execute(
        f"""
        COPY (
            SELECT * EXCLUDE (text), text, length(text) AS n_chars FROM (
                SELECT d.* EXCLUDE (doc_id, text, n_chars),
                       d.doc_id + i.range * {max_doc} AS doc_id,
                       {text_expr} AS text
                FROM read_parquet('{src}/documents.parquet') d
                CROSS JOIN range({k}) i
            )
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    max_vec = con.execute(
        f"SELECT max(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
            SELECT e.* EXCLUDE (vec_id, embedding),
                   e.vec_id + i.range * {max_vec} AS vec_id,
                   CAST(list_transform(e.embedding,
                        x -> x + 0.0001 * i.range) AS FLOAT[]) AS embedding
            FROM read_parquet('{src}/embeddings.parquet') e
            CROSS JOIN range({k}) i
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    # events is written with pyarrow, not DuckDB, so the synthetic
    # file keeps the SOURCE file's exact timestamp unit (driver
    # generations have shipped both TIMESTAMP(NANOS) and
    # TIMESTAMP(MICROS); the engine's events reader branches on the
    # layout it reads). The +i-day shift is computed in the source
    # column's own unit so copies land one day apart either way.
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{src}/events.parquet")
    max_ev = pa.compute.max(tbl["event_id"]).as_py() + 1
    ts_type = tbl.schema.field("ts").type
    day_units = {
        "ns": 86_400_000_000_000,
        "us": 86_400_000_000,
        "ms": 86_400_000,
        "s": 86_400,
    }[ts_type.unit]
    copies = []
    for i in range(k):
        cols = {}
        for name in tbl.column_names:
            col = tbl[name].combine_chunks()
            if name == "event_id":
                col = pa.compute.add(col, i * max_ev)
            elif name == "ts":
                shifted = pa.compute.add(col.cast(pa.int64()), i * day_units)
                col = shifted.cast(ts_type)
            cols[name] = col
        copies.append(pa.table(cols))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/events.parquet", store_schema=False)
    for t in ("orders", "lineitem", "events", "documents", "embeddings"):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src, dst, k = args[0], args[1], int(args[2])
    generate(src, dst, k, perturbed_docs="--perturbed-docs" in flags)
