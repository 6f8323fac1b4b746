"""Adversarial-fixture generator: distort an existing sf dir into the
inputs the driver fixtures never contain but 100 TB corpora always do
— NULLs in every nullable position, heavy key skew, duplicate
sort keys, and a unicode zoo (NFD, ZWJ emoji, RTL, CJK, zero-width,
surrogate-pair math alphabets, Thai) — while preserving the exact
schema, primary-key uniqueness, and referential integrity the queries
rely on. The oracle sweep (scripts/oracle_sweep.py) then adjudicates
every registered query against its DuckDB twin on the distorted data:
a query is only correct if BOTH engines agree on ANY valid input of
the schema, not just the driver's clean generator output.

All mutations are deterministic (key-modulo selects + fixed literal
payloads), so the fixture is reproducible bit-for-bit.

What it deliberately does NOT distort (documented data contracts):
- embedding dimensionality (stays 64; operators state fixed-dim)
- l_orderkey -> o_orderkey / o_custkey -> c_custkey /
  l_partkey -> p_partkey / l_suppkey -> s_suppkey integrity
- primary keys (doc_id, event_id, o_orderkey, (l_orderkey,
  l_linenumber), vec_id, c_custkey) stay unique and non-null

Usage: python scripts/gen_adversarial.py SRC_DIR DST_DIR
    # canonical: python scripts/gen_adversarial.py /root/testdata/sf0.01 /tmp/sfadv
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

COPY_TABLES = ("region", "nation", "supplier", "part")

# unicode zoo: one representative per breakage class
ZOO = [
    # NFC/NFD mixed: same glyphs, different code-point sequences
    "café café résumé résumé naïve naïve",
    # ZWJ emoji families + variation selectors + skin-tone modifiers
    "family \U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 flag \U0001f3f3️‍\U0001f308 thumbs \U0001f44d\U0001f3fd up",
    # CJK + kana + hangul (no-space scripts)
    "春江潮水连海平 海上明月共潮生 日本語テキスト 한국어 텍스트",
    # RTL Arabic + Hebrew mixed with LTR
    "مرحبا بالعالم שלום עולם mixed with english",
    # zero-width space / non-joiner / joiner / BOM embedded mid-word
    "zero​width‌join‍er﻿bom text",
    # orphan combining marks (no base character)
    "́̂̃ orphan combining marks ًّ",
    # control whitespace: newlines, tabs, CRLF
    "line1\nline2\ttabbed\r\nwindows line\x0bvtab",
    # long repetitive doc (repetition/dedup signal saturation)
    ("spam ham " * 180).strip(),
    # single character
    "x",
    # digits + punctuation only (zero alpha tokens)
    "1234567890 !!! ??? ... ;;; %%% ((( ))) [[[ ]]]",
    # case-folding edge cases: sharp s, Turkish dotted/dotless i
    "Straße STRASSE İstanbul ısparta SS ss",
    # surrogate-pair math alphanumerics + symbols
    "∑∫∂ ≠ ≤ ≥ → \U0001d518\U0001d52b\U0001d526\U0001d520\U0001d52c\U0001d521\U0001d522 \U0001d54a\U0001d561\U0001d552\U0001d563\U0001d55c",
    # Greek mixed with Latin lookalikes
    "Ωmega Δelta αβγδ κόσμος",
    # quoting / escaping / shell-ish metacharacters
    "quote\" back\\slash 'single' `tick` $dollar {brace} <angle>",
    # pathological whitespace runs
    "   leading and   multiple    internal   spaces   ",
    # Thai: no inter-word separators at all
    "ภาษาไทยไม่มีช่องว่างระหว่างคำ",
]


def generate(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    con.execute("CREATE TABLE zoo (i INTEGER, t VARCHAR)")
    con.executemany("INSERT INTO zoo VALUES (?, ?)", list(enumerate(ZOO)))

    # documents: ~1/7 of docs get a zoo text; sprinkle NULL/empty/
    # whitespace-only texts and NULL lang/source. n_chars stays true
    # to the (possibly new) text, NULL when text is NULL.
    con.execute(
        f"""
        COPY (
            WITH base AS (
                SELECT d.doc_id,
                       CASE
                           WHEN d.doc_id % 83 = 11 THEN NULL
                           WHEN d.doc_id % 83 = 23 THEN ''
                           WHEN d.doc_id % 83 = 47 THEN '   '
                           WHEN d.doc_id % 7 = 3
                               THEN (SELECT t FROM zoo
                                     WHERE i = d.doc_id % {len(ZOO)})
                           ELSE d.text
                       END AS text,
                       CASE WHEN d.doc_id % 31 = 5 THEN NULL
                            ELSE d.lang END AS lang,
                       CASE WHEN d.doc_id % 37 = 9 THEN NULL
                            ELSE d.source END AS source
                FROM read_parquet('{src}/documents.parquet') d
            )
            SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM base
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # events: NULL value/props/event_type/ts buckets; 40% of traffic
    # remapped onto one hot user; 5% of rows share ONE exact timestamp
    # (sort-key ties); event_id stays unique.
    con.execute(
        f"""
        COPY (
            SELECT event_id,
                   CASE WHEN event_id % 97 = 13 THEN NULL
                        WHEN event_id % 20 = 7
                            THEN TIMESTAMP '2024-03-15 12:00:00'
                        ELSE ts END AS ts,
                   CASE WHEN event_id % 5 < 2 THEN 0
                        ELSE user_id END AS user_id,
                   CASE WHEN event_id % 53 = 17 THEN NULL
                        ELSE event_type END AS event_type,
                   CASE WHEN event_id % 13 = 4 THEN NULL
                        ELSE value END AS value,
                   CASE WHEN event_id % 11 = 6 THEN NULL
                        ELSE props END AS props
            FROM read_parquet('{src}/events.parquet')
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )

    # orders: 30% of orders collapse onto the minimum custkey (hot
    # customer), sparse NULL o_totalprice / o_orderdate.
    con.execute(
        f"""
        COPY (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 10 < 3
                        THEN (SELECT min(c_custkey)
                              FROM read_parquet('{src}/customer.parquet'))
                        ELSE o_custkey END AS o_custkey,
                   o_orderstatus,
                   CASE WHEN o_orderkey % 101 = 19 THEN NULL
                        ELSE o_totalprice END AS o_totalprice,
                   CASE WHEN o_orderkey % 211 = 37 THEN NULL
                        ELSE o_orderdate END AS o_orderdate,
                   o_orderpriority
            FROM read_parquet('{src}/orders.parquet')
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
        """
    )

    # lineitem: 30% of rows collapse onto the minimum partkey (hot
    # part), sparse NULLs in every price/date arithmetic input.
    con.execute(
        f"""
        COPY (
            SELECT l_orderkey,
                   CASE WHEN (l_orderkey * 7 + l_linenumber) % 10 < 3
                        THEN (SELECT min(p_partkey)
                              FROM read_parquet('{src}/part.parquet'))
                        ELSE l_partkey END AS l_partkey,
                   l_suppkey, l_linenumber,
                   CASE WHEN (l_orderkey + l_linenumber) % 199 = 3 THEN NULL
                        ELSE l_quantity END AS l_quantity,
                   l_extendedprice,
                   CASE WHEN (l_orderkey + l_linenumber) % 103 = 7 THEN NULL
                        ELSE l_discount END AS l_discount,
                   CASE WHEN (l_orderkey + l_linenumber) % 107 = 11 THEN NULL
                        ELSE l_tax END AS l_tax,
                   l_returnflag, l_linestatus,
                   CASE WHEN (l_orderkey + l_linenumber) % 223 = 13 THEN NULL
                        ELSE l_shipdate END AS l_shipdate
            FROM read_parquet('{src}/lineitem.parquet')
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )

    # customer: unicode names on a slice, NULL acctbal/mktsegment.
    con.execute(
        f"""
        COPY (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 17 = 3
                        THEN (SELECT t FROM zoo
                              WHERE i = c_custkey % {len(ZOO)})
                        ELSE c_name END AS c_name,
                   c_nationkey,
                   CASE WHEN c_custkey % 29 = 5 THEN NULL
                        ELSE c_acctbal END AS c_acctbal,
                   CASE WHEN c_custkey % 41 = 7 THEN NULL
                        ELSE c_mktsegment END AS c_mktsegment
            FROM read_parquet('{src}/customer.parquet')
        ) TO '{dst}/customer.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings: exact-zero vectors (norm 0 -> cosine 0/0), exact
    # duplicate vectors (distance ties in every top-k), NULL labels.
    # Dimensionality stays 64 per the operators' documented contract.
    con.execute(
        f"""
        COPY (
            SELECT e.vec_id,
                   CASE
                       WHEN e.vec_id % 101 = 7
                           THEN list_transform(e.embedding,
                                               x -> CAST(0.0 AS FLOAT))
                       WHEN e.vec_id % 50 = 49
                           THEN (SELECT p.embedding
                                 FROM read_parquet(
                                     '{src}/embeddings.parquet') p
                                 WHERE p.vec_id = e.vec_id - 1)
                       ELSE e.embedding
                   END AS embedding,
                   CASE WHEN e.vec_id % 43 = 9 THEN NULL
                        ELSE e.label END AS label
            FROM read_parquet('{src}/embeddings.parquet') e
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    generate(sys.argv[1], sys.argv[2])
    print(f"adversarial fixture written to {sys.argv[2]}")
