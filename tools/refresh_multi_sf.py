#!/usr/bin/env python
"""Rebuild ORACLE_MULTI_SF.json from the most recent full-sweep logs.

Usage: python tools/refresh_multi_sf.py LABEL=LOGFILE [...]

Each LOGFILE is an oracle_check stdout capture; its LAST
``oracle_local_summary`` JSON line becomes the sweep entry under
LABEL. Refuses logs whose summary reports failures or whose sweep
didn't finish ("all queries match" absent) — a partial or red log must
never masquerade as a certification receipt.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main() -> int:
    entries = {}
    for arg in sys.argv[1:]:
        label, _, path = arg.partition("=")
        if not path:
            print(f"bad arg (want LABEL=LOGFILE): {arg}")
            return 1
        # r11 ADVICE: 'finished' must be tied to THIS summary, not any
        # completion line anywhere in the log — a log holding an old
        # green sweep plus a newer rerun that emitted a summary but
        # crashed before completing must be refused. Track order: the
        # 'all queries match' marker counts only when it appears AFTER
        # the last summary line.
        summary = None
        finished = False
        with open(path) as fh:
            for line in fh:
                if '"oracle_local_summary"' in line:
                    try:
                        summary = json.loads(line)
                        finished = False  # new sweep: needs its own marker
                    except ValueError:
                        pass
                if "all queries match" in line:
                    finished = True
        if summary is None or not finished:
            print(
                f"{label}: no completion marker after the last summary "
                f"in {path} — refusing"
            )
            return 1
        if summary.get("n_fail"):
            print(f"{label}: {summary['n_fail']} failures — refusing")
            return 1
        entries[label] = {
            k: summary[k]
            for k in ("sf_dir", "n_queries", "n_hash_match",
                      "n_rows_only", "n_fail")
        }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # test hook: redirect the receipt so unit tests never overwrite
    # the committed artifact
    out_path = os.environ.get(
        "MULTI_SF_OUT", os.path.join(root, "ORACLE_MULTI_SF.json")
    )
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=root, capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "metric": "oracle_multi_sf",
        "origin": commit,
        "note": (
            "Full registry Spark-vs-DuckDB value-hash comparison at three "
            "scale factors PLUS the zipf-skew dataset "
            "(tools/gen_skew_data.py: events.user_id, orders.o_custkey, "
            "lineitem.l_suppkey re-drawn Zipf(1); hottest key ~10% of "
            "rows). Round 11's first skew sweep caught a second-truncated "
            "session-gap compare (events_sessionization) that three "
            "uniform SFs all hid — repaired and re-swept green."
        ),
        "sweeps": entries,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote ORACLE_MULTI_SF.json with {len(entries)} sweeps @ {commit}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
