"""Semantic invariants for the corpus-filter and CDC queries, checked
against pure-Python reference computations (not SQL twins — a mirror
bug written into both the Spark code and the oracle SQL would pass
parity; an independent dict/loop implementation won't)."""

from __future__ import annotations

import duckdb

from kittispark import registry

SF = "/root/testdata/sf0.001"
SPECS = registry.all_specs()


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_merge_upsert_matches_dict_simulation(spark):
    # Reference: apply the change log to a dict, Python-side.
    base = dict(
        _duck(
            "SELECT c_custkey, c_acctbal FROM customer "
            "WHERE c_custkey BETWEEN 50 AND 250"
        )
    )
    latest = {}
    for uid, etype, val, ts, eid in _duck(
        "SELECT user_id, event_type, value, ts, event_id FROM events"
    ):
        if uid not in latest or (ts, eid) > latest[uid][1]:
            latest[uid] = ((etype, val), (ts, eid))
    snapshot = dict(base)
    actions = {k: "keep" for k in base}
    for uid, ((etype, val), _) in latest.items():
        if etype == "error":
            if uid in snapshot:
                del snapshot[uid]
                del actions[uid]
            continue
        actions[uid] = "update" if uid in snapshot else "insert"
        snapshot[uid] = val
    got = {
        r.key: (r.val, r.action)
        for r in SPECS["merge_upsert_snapshot"].fn(spark, SF).collect()
    }
    assert got == {k: (v, actions[k]) for k, v in snapshot.items()}


def test_scd2_intervals_tile_each_user(spark):
    rows = SPECS["scd2_user_value_history"].fn(spark, SF).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    n_views = _duck(
        "SELECT count(*) FROM events WHERE event_type = 'view'"
    )[0][0]
    assert sum(len(v) for v in by_user.values()) == n_views
    for hist in by_user.values():
        hist.sort(key=lambda r: r.version)
        # versions dense from 1; intervals chain with no gap/overlap;
        # exactly one open (current) interval, and it is the last
        assert [r.version for r in hist] == list(range(1, len(hist) + 1))
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from
            assert not a.is_current
        assert hist[-1].is_current and hist[-1].valid_to is None


def test_quantize_codes_bounded_and_reconstructable(spark):
    rows = SPECS["embedding_quantize_int8"].fn(spark, SF).collect()
    assert rows
    originals = dict(
        _duck("SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200")
    )
    for r in rows:
        # q_codes ships ','-joined in dimension order (the driver's
        # canonicalizer cannot sort raw array columns)
        codes = [int(c) for c in r.q_codes.split(",")]
        assert r.n_dims == 64 and len(codes) == 64
        step = (r.vmax - r.vmin) / 127.0
        for code, x in zip(codes, originals[r.vec_id]):
            assert 0 <= code <= 127
            # inverting the affine code recovers x to one step
            assert abs((r.vmin + code * step) - x) <= step + 1e-12


def test_quality_filter_rules_recomputed(spark):
    rows = SPECS["quality_filter_composite"].fn(spark, SF).collect()
    texts = dict(_duck("SELECT doc_id, text FROM documents"))
    assert len(rows) == len(texts)
    for r in rows:
        toks = texts[r.doc_id].split(" ")
        expected = []
        if len(toks) < 50:
            expected.append("too_short")
        if len(toks) > 120:
            expected.append("too_long")
        if len(set(toks)) * 10 < len(toks) * 3:
            expected.append("low_diversity")
        if sum(len(t) for t in toks) > len(toks) * 8:
            expected.append("long_words")
        # reasons ships '|'-joined in rule order ('' = no rule fired)
        assert (r.reasons.split("|") if r.reasons else []) == expected
        assert r.keep == (not expected)


def test_top_bigram_argmax_recomputed(spark):
    rows = SPECS["top_bigram_repetition"].fn(spark, SF).collect()
    texts = dict(_duck("SELECT doc_id, text FROM documents WHERE doc_id < 200"))
    assert len(rows) == len(texts)
    for r in rows:
        toks = texts[r.doc_id].split(" ")
        grams: dict[str, int] = {}
        for a, b in zip(toks, toks[1:]):
            grams[f"{a} {b}"] = grams.get(f"{a} {b}", 0) + 1
        best = min(grams, key=lambda g: (-grams[g], g))
        assert (r.top_bigram, r.top_count, r.n_bigrams) == (
            best,
            grams[best],
            len(toks) - 1,
        )


def test_lang_balance_every_class_at_quota(spark):
    rows = SPECS["lang_balance_quota"].fn(spark, SF).collect()
    counts = dict(_duck("SELECT lang, count(*) FROM documents GROUP BY lang"))
    q = min(counts.values())
    per_lang: dict[str, list[int]] = {}
    for r in rows:
        per_lang.setdefault(r.lang, []).append(r.rk)
    assert set(per_lang) == set(counts)
    for rks in per_lang.values():
        assert sorted(rks) == list(range(1, q + 1))


def test_pii_redaction_removes_all_pii(spark):
    import re

    rows = SPECS["pii_redaction"].fn(spark, SF).collect()
    email, phone = r"[a-z0-9]+@[a-z]+\.[a-z]+", r"\+[0-9]-[0-9]{3}-[0-9]{4}"
    for r in rows:
        assert r.n_emails == r.doc_id % 3
        assert r.n_phones == r.doc_id % 2
        assert not re.search(email, r.redacted_tail)
        assert not re.search(phone, r.redacted_tail)
        if r.doc_id % 3 and not r.doc_id % 2:
            assert "<EMAIL>" in r.redacted_tail
