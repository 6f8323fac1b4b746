"""JSONL sink/source roundtrip fidelity on adversarial content: the
registered query proves the documents table survives; these tests
prove the escaping-sensitive cases (newlines, quotes, backslashes,
unicode, empty and NULL text) that a synthetic corpus may not cover.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_NASTY = [
    (0, "plain ascii"),
    (1, 'quotes " and \\ backslash \\" both'),
    (2, "newline\nand\ttab\rand carriage"),
    (3, "unicode: café 中文 ☃"),
    (4, ""),  # empty string must stay empty, not become NULL
    (5, None),  # NULL must stay NULL, not become "" or "null"
    (6, "{\"looks\": \"like json\"}"),
    (7, "control \x01 \x1f chars"),
]


def test_jsonl_roundtrip_preserves_every_value(spark, tmp_path):
    df = spark.createDataFrame(_NASTY, _SCHEMA)
    path = str(tmp_path / "jsonl")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(_SCHEMA).json(path)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(_NASTY)


def test_jsonl_registered_query_matches_source_rows(spark):
    """The registered roundtrip projection equals the same projection
    computed straight from parquet — row for row, digest for digest."""
    from kittispark.queries.llm_pipeline import jsonl_corpus_roundtrip
    from kittispark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["lang"], r["source"], r["n_chars"], r["text_len"], r["text_md5"])
        for r in jsonl_corpus_roundtrip(spark, sf).collect()
    }
    want = {
        r["doc_id"]: (r["lang"], r["source"], r["n_chars"], r["text_len"], r["text_md5"])
        for r in load_table(spark, sf, "documents")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.length("text").alias("text_len"),
            F.md5("text").alias("text_md5"),
        )
        .collect()
    }
    assert got == want


def test_csv_roundtrip_preserves_null_empty_and_quoting(spark, tmp_path):
    """CSV needs explicit options for exact fidelity: RFC-4180 quote
    doubling, a nullValue sentinel so NULL != '', multiLine read for
    embedded newlines. This pins the exact option set the registered
    query uses (the defaults conflate '' with NULL)."""
    rows = [
        (0, "plain"),
        (1, 'with "quotes" and, commas'),
        (2, "embedded\nnewline"),
        (3, ""),
        (4, None),
        (5, "unicode café ☃"),
        (6, "\\N literal backslash-N"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "csv")
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
        .csv(path)
    )
    back = (
        spark.read.schema("doc_id long, text string")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .option("nullValue", "\\N")
        .csv(path)
    )
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == dict(rows)
