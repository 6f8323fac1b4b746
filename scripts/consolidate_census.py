"""Merge agghash_census log files into AGGHASH_CENSUS_50X.json.

Later entries for a name supersede earlier ones (a slice re-run or a
converted exclusion replaces the stale row). Any registered query with
no recorded row lands in the not_attempted ledger, which since r11
carries PER-NAME reasons (VERDICT r10 #4) instead of a blanket class.

Usage:
    python scripts/consolidate_census.py OUT_JSON LOG_FILE [LOG_FILE...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kittispark import registry  # noqa: E402

# Per-name reasons for queries deliberately not run at the 50x SF
# tier. Keep every entry justified by the query's own input shape —
# a name missing here AND missing from the logs is flagged so a
# silent coverage gap cannot hide in the ledger.
NOT_ATTEMPTED_REASONS: dict[str, str] = {
    n: "input is the synthesized KITTI fixture tree (file-path scans / "
    "byte roundtrips over .bin/.txt artifacts), not the sf parquet "
    "tables — an SF-scaled fixture does not parameterize it; covered "
    "by the dedicated --kitti-scale regime (10x KITTI fixtures, "
    "byte-level oracles)"
    for n in (
        "kitti_analysis_envelope",
        "kitti_calib_chain",
        "kitti_cutout_roundtrip",
        "kitti_datasource_scan",
        "kitti_frame_lookup",
        "kitti_label_file_scan",
        "kitti_points_bin_roundtrip",
    )
}


def main() -> int:
    out_path, logs = sys.argv[1], sys.argv[2:]
    rows: dict[str, dict] = {}
    for log in logs:
        text = open(log).read()
        try:
            # a previous consolidated census JSON is also a valid input
            prior = json.loads(text)
            entries = prior["queries"] if isinstance(prior, dict) else prior
        except Exception:
            entries = []
            for line in text.splitlines():
                try:
                    entries.append(json.loads(line))
                except Exception:
                    continue
        for row in entries:
            if not isinstance(row, dict) or row.get("status") in (None, "started"):
                continue
            if row.get("status", "").startswith("excluded"):
                # a standing exclusion never overwrites a real verdict,
                # and a later real verdict retires the exclusion
                rows.setdefault(row["name"], row)
                continue
            rows[row["name"]] = row
    all_names = set(registry.all_specs())
    summary: dict[str, int] = {}
    for row in rows.values():
        key = row["status"] + ("_sliced" if "slice" in row else "")
        summary[key] = summary.get(key, 0) + 1
    missing = sorted(all_names - set(rows))
    unexplained = [n for n in missing if n not in NOT_ATTEMPTED_REASONS]
    doc = {
        "tier": "50x (/tmp/sf5synth; sliced names note their fixture)",
        "mode": "compare_agghash dual-fold",
        "round": 11,
        "summary": summary,
        "queries": [rows[n] for n in sorted(rows)],
        "not_attempted": {
            "count": len(missing),
            "reasons": {n: NOT_ATTEMPTED_REASONS[n] for n in missing
                        if n in NOT_ATTEMPTED_REASONS},
        },
    }
    if unexplained:
        doc["not_attempted"]["UNEXPLAINED"] = unexplained
        print(f"WARNING: {len(unexplained)} recorded-nowhere names:",
              *unexplained, sep="\n  ")
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"WROTE {out_path}: {sum(summary.values())} recorded "
          f"({summary}), {len(missing)} not attempted")
    return 1 if unexplained else 0


if __name__ == "__main__":
    raise SystemExit(main())
