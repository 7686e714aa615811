#!/usr/bin/env python
"""Generate the skew-amplified certification dataset (r10 VERDICT
item 7).

Uniform scale-up (sf0.001 → sf0.1) found bugs that magnitude hides —
but every driver table is key-UNIFORM, so the skew claims the 100 TB
story rests on (AQE skew joins, salting, per-key window state) were
never adversarially certified. This derives ``testdata_skew/`` from
the driver's sf0.1 tables (derivation, not synthesis: every table
except ``events`` is the sf0.1 file itself via symlink):

- ``events.parquet``: ``user_id`` remapped to a Zipf(1) distribution
  over the SAME user domain by inverse-CDF — ``ceil(N ** u)`` for a
  deterministic per-event uniform ``u`` (multiplicative hash of
  ``event_id``; no RNG, reproducible byte-for-byte). P(user = k) ∝ 1/k,
  so user 1 carries ~9.5% of all 100k events (~142× the uniform
  share) and the top-10 users carry ~37%: worst-case hot keys for
  every groupBy/join/window over ``user_id``. All other columns ride
  along unchanged; the domain is preserved so enrichment joins still
  match.

The full oracle sweep (``tools/oracle_check.py testdata_skew``) then
certifies every registered query Spark-vs-DuckDB on adversarially
skewed keys — the fourth sweep entry in ORACLE_MULTI_SF.json.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "documents embeddings"
).split()

# deterministic multiplicative hash → uniform in [0, 1)
HASH_SQL = (
    "((event_id * 2654435761) % 1000000007) / 1000000007.0"
)


def main() -> int:
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "testdata_skew")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    con = duckdb.connect()
    con.execute("SET threads=4")
    n_users = con.execute(
        f"SELECT MAX(user_id) FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT event_id, ts,
                 CAST(LEAST({n_users}, GREATEST(1,
                      FLOOR(POW({n_users}, {HASH_SQL})))) AS BIGINT)
                   AS user_id,
                 event_type, value, props
          FROM '{SRC}/events.parquet'
          ORDER BY event_id
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    top = con.execute(
        f"""
        SELECT user_id, COUNT(*) AS n,
               ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct
        FROM '{out}/events.parquet' GROUP BY 1 ORDER BY n DESC LIMIT 5
        """
    ).fetchall()
    total, distinct = con.execute(
        f"SELECT COUNT(*), COUNT(DISTINCT user_id) FROM '{out}/events.parquet'"
    ).fetchone()
    print(f"wrote {out}/events.parquet: {total} rows, {distinct} users")
    for uid, n, pct in top:
        print(f"  user {uid}: {n} events ({pct}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
