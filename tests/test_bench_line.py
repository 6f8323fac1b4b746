"""The driver parses bench.py's single stdout JSON line out of a
2000-char tail buffer. build_stdout_line must stay <= 1800 chars at
ANY registry size by capping the per-query dict to the top-K most
expensive rows (full 3dp precision, true count in "n") instead of the
old dead-code precision ladder (VERDICT r9 #5 / ADVICE r9)."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_small_registry_full_dict_untruncated():
    t = {f"q{i}": 1.234 for i in range(10)}
    obj, line = bench.build_stdout_line(t, 12.34, 0.1)
    assert len(line) <= 1800
    assert "queries_truncated_to_top_k" not in obj
    assert obj["n"] == 10
    assert obj["queries"] == t


def test_large_registry_caps_to_top_k_most_expensive():
    t = {
        f"query_name_with_average_length_{i:03d}": round(0.1 + i * 0.013, 3)
        for i in range(150)
    }
    _obj, line = bench.build_stdout_line(t, round(sum(t.values()), 3), 0.1)
    parsed = json.loads(line)
    assert len(line) <= 1800
    assert parsed["n"] == 150
    k = parsed["queries_truncated_to_top_k"]
    assert k == len(parsed["queries"]) > 0
    top = sorted(t, key=t.get, reverse=True)[:k]
    assert set(parsed["queries"]) == set(top)
    # full 3dp precision survives the cap — no ladder
    assert all(parsed["queries"][n] == t[n] for n in parsed["queries"])


def test_current_headline_size_fits():
    # the real 67-query registry shape: realistic name lengths
    t = {n: 1.234 for n in bench.HEADLINE}
    _obj, line = bench.build_stdout_line(t, round(sum(t.values()), 3), 0.1)
    assert len(line) <= 1800
