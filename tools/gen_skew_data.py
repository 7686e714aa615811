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
  over the SAME user domain by inverse-CDF — ``floor(N ** u)`` for a
  deterministic per-event uniform ``u`` (multiplicative hash of
  ``event_id``; no RNG, reproducible byte-for-byte). P(user = k) ∝ 1/k,
  so user 1 carries ~9.5% of all 100k events (~142× the uniform
  share) and the top-10 users carry ~37%: worst-case hot keys for
  every groupBy/join/window over ``user_id``. All other columns ride
  along unchanged; the domain is preserved so enrichment joins still
  match.
- ``orders.parquet``: ``o_custkey`` re-drawn Zipf(1) over the customer
  key domain (hash of ``o_orderkey``), and ``lineitem.parquet``:
  ``l_suppkey`` re-drawn Zipf(1) over the supplier key domain (hash of
  ``l_orderkey * 8 + l_linenumber``) — so the TPC-H relational half of
  the registry (customer-orders joins, supplier profit rollups, the
  salted-join path) sees the same hot-key adversary as the events
  half. FK domains are preserved (every remapped key exists in its
  dimension); order↔lineitem linkage is untouched. Zipf leaves the
  domain TAIL empty (most customers now have no orders), which is
  itself adversarial: empty-group and COUNT-over-empty semantics get
  exercised registry-wide, the class the r10 sf0.1 sweep caught once.

The full oracle sweep (``tools/oracle_check.py testdata_skew``) then
certifies every registered query Spark-vs-DuckDB on adversarially
skewed keys — the fourth sweep entry in ORACLE_MULTI_SF.json.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
SYMLINKED = (
    "region nation customer supplier part documents embeddings"
).split()


def _zipf_sql(seed_expr: str, n: int) -> str:
    """Zipf(1) inverse-CDF over [1, n] from a deterministic
    multiplicative hash of ``seed_expr`` (P(k) ∝ 1/k)."""
    u = f"(({seed_expr}) * 2654435761) % 1000000007 / 1000000007.0"
    return (
        f"CAST(LEAST({n}, GREATEST(1, FLOOR(POW({n}, {u})))) AS BIGINT)"
    )


def main() -> int:
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "testdata_skew")
    os.makedirs(out, exist_ok=True)
    for t in SYMLINKED:
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    con = duckdb.connect()
    con.execute("SET threads=4")
    n_users = con.execute(
        f"SELECT MAX(user_id) FROM '{SRC}/events.parquet'"
    ).fetchone()[0]
    n_cust = con.execute(
        f"SELECT MAX(c_custkey) FROM '{SRC}/customer.parquet'"
    ).fetchone()[0]
    n_supp = con.execute(
        f"SELECT MAX(s_suppkey) FROM '{SRC}/supplier.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT event_id, ts,
                 {_zipf_sql('event_id', n_users)} AS user_id,
                 event_type, value, props
          FROM '{SRC}/events.parquet'
          ORDER BY event_id
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    o_cols = [
        r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/orders.parquet'"
        ).fetchall()
    ]
    o_sel = ", ".join(
        _zipf_sql("o_orderkey", n_cust) + " AS o_custkey"
        if c == "o_custkey" else c
        for c in o_cols
    )
    con.execute(
        f"""
        COPY (
          SELECT {o_sel} FROM '{SRC}/orders.parquet' ORDER BY o_orderkey
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )
    l_cols = [
        r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{SRC}/lineitem.parquet'"
        ).fetchall()
    ]
    l_sel = ", ".join(
        _zipf_sql("l_orderkey * 8 + l_linenumber", n_supp) + " AS l_suppkey"
        if c == "l_suppkey" else c
        for c in l_cols
    )
    con.execute(
        f"""
        COPY (
          SELECT {l_sel} FROM '{SRC}/lineitem.parquet'
          ORDER BY l_orderkey, l_linenumber
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    for tbl, key in (
        ("events", "user_id"), ("orders", "o_custkey"),
        ("lineitem", "l_suppkey"),
    ):
        top = con.execute(
            f"""
            SELECT {key}, COUNT(*) AS n,
                   ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct
            FROM '{out}/{tbl}.parquet' GROUP BY 1 ORDER BY n DESC LIMIT 3
            """
        ).fetchall()
        total, distinct = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT {key}) "
            f"FROM '{out}/{tbl}.parquet'"
        ).fetchone()
        print(f"{tbl}: {total} rows, {distinct} distinct {key}")
        for k, n, pct in top:
            print(f"  {key}={k}: {n} rows ({pct}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
