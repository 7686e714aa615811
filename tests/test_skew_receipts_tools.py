"""Guards for the round-11 certification tooling: the skew-data
generator must stay deterministic (a receipt over nondeterministic
data certifies nothing), and the multi-SF receipt refresher must
refuse partial or red sweep logs."""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_skew_events_remap_is_deterministic():
    """The generator's Zipf remap is a pure hash expression — no RNG.
    Pin the hot-key census so any accidental nondeterminism (or a
    silent distribution change) fails loudly rather than producing a
    subtly different certification dataset."""
    import duckdb

    path = os.path.join(ROOT, "testdata_skew", "events.parquet")
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_skew_data.py")],
            cwd=ROOT, check=True, capture_output=True,
        )
    con = duckdb.connect()
    con.execute("SET threads=2")
    top = con.execute(
        f"SELECT user_id, COUNT(*) FROM '{path}' "
        "GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 3"
    ).fetchall()
    # exact counts from the committed generator at sf0.1 (seedless,
    # multiplicative-hash inverse-CDF): any change here means the
    # dataset under the skew receipts changed
    assert top == [(1, 9478), (2, 5545), (3, 3934)], top


def _run_refresh(tmp_path, content):
    log = tmp_path / "sweep.log"
    log.write_text(content)
    env = dict(os.environ, MULTI_SF_OUT=str(tmp_path / "receipt.json"))
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "refresh_multi_sf.py"),
         f"x={log}"],
        cwd=str(tmp_path), capture_output=True, text=True, env=env,
    )


_SUMMARY = json.dumps({
    "metric": "oracle_local_summary", "sf_dir": "/x", "n_queries": 5,
    "n_hash_match": 5, "n_rows_only": 0, "n_fail": 0,
})


def test_refresher_refuses_unfinished_log(tmp_path):
    r = _run_refresh(tmp_path, _SUMMARY + "\n")  # no "all queries match"
    assert r.returncode == 1
    assert "refusing" in r.stdout


def test_refresher_refuses_red_log(tmp_path):
    red = _SUMMARY.replace('"n_fail": 0', '"n_fail": 2')
    r = _run_refresh(tmp_path, red + "\nall queries match\n")
    assert r.returncode == 1
    assert "refusing" in r.stdout


def test_refresher_accepts_finished_green_log(tmp_path):
    r = _run_refresh(tmp_path, _SUMMARY + "\nall queries match\n")
    assert r.returncode == 0, r.stdout
    receipt = json.loads((tmp_path / "receipt.json").read_text())
    assert receipt["sweeps"]["x"]["n_fail"] == 0
