#!/usr/bin/env python
"""Generate the VALUE/SIZE-skew certification dataset (r11 VERDICT
follow-up: the fifth sweep entry, after the KEY-skew zipf dataset).

The zipf dataset certified hot KEYS; this one certifies hot VALUES and
hot SIZES — the other axis the 100 TB story rests on:

- ``documents.parquet``: text LENGTHS re-drawn heavy-tailed by
  repeating each document's own body a deterministic multiplier of
  times (hash of ``doc_id``; no RNG): ~0.1% of docs ×1024, ~0.9%
  ×64, ~49% ×2, the rest ×1. The biggest documents are ~1000× the
  median length — the partition-imbalance shape real crawl corpora
  have, where one executor's explode output dwarfs the others'.
  Repetition (rather than fresh text) is deliberately adversarial a
  second way: a 300k-char document whose VOCABULARY stays ~40 distinct
  shingles exercises saturated-vocab paths (the shape that exposed the
  heaps_law_fit signed-zero in r11) and repeated-shingle multiplicity
  handling in every dedup/winnowing pipeline. ``n_chars`` is recomputed
  so the stored-metadata invariant (n_chars = LENGTH(text)) holds.
- ``events.parquet``: ``value`` re-drawn heavy-tailed by scaling with a
  deterministic power-of-ten factor (hash of ``event_id``): ~0.1% of
  events ×1e6, ~0.9% ×1e3, the rest unchanged. Sums become dominated
  by a handful of terms six orders of magnitude above the median —
  the worst case for float-accumulation-order divergence between
  engines, which is exactly what the env-sensitivity rules (decimal
  sums, 9-sig-digit budgets) claim to withstand. A hash mismatch here
  is a real latent defect, not noise.

Every other table is the sf0.1 file itself via symlink (derivation,
not synthesis). The full oracle sweep
(``tools/oracle_check.py testdata_longdoc``) then certifies every
registered query Spark-vs-DuckDB under size/value skew — the fifth
sweep entry in ORACLE_MULTI_SF.json.
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
SYMLINKED = (
    "region nation customer supplier part orders lineitem embeddings"
).split()


def _u(seed_expr: str) -> str:
    """Deterministic uniform in [0,1) from a multiplicative hash."""
    return f"((({seed_expr}) * 2654435761) % 1000000007) / 1000000007.0"


def main() -> int:
    import duckdb

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "testdata_longdoc")
    os.makedirs(out, exist_ok=True)
    for t in SYMLINKED:
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)
    con = duckdb.connect()
    con.execute("SET threads=4")
    u_doc = _u("doc_id")
    mult = (
        f"CASE WHEN {u_doc} < 0.001 THEN 1024 "
        f"WHEN {u_doc} < 0.01 THEN 64 "
        f"WHEN {u_doc} < 0.5 THEN 2 ELSE 1 END"
    )
    # TRIM strips the final separator so tokenization sees no empty
    # trailing token; body repeats are space-joined, preserving the
    # word stream exactly mult times
    new_text = f"TRIM(REPEAT(text || ' ', {mult}))"
    con.execute(
        f"""
        COPY (
          SELECT doc_id,
                 {new_text} AS text,
                 lang, source,
                 LENGTH({new_text}) AS n_chars
          FROM '{SRC}/documents.parquet'
          ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    u_ev = _u("event_id")
    scale = (
        f"CASE WHEN {u_ev} < 0.001 THEN 1000000.0 "
        f"WHEN {u_ev} < 0.01 THEN 1000.0 ELSE 1.0 END"
    )
    con.execute(
        f"""
        COPY (
          SELECT event_id, ts, user_id, event_type,
                 value * {scale} AS value,
                 props
          FROM '{SRC}/events.parquet'
          ORDER BY event_id
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    n, med, mx, tot = con.execute(
        f"SELECT COUNT(*), MEDIAN(n_chars), MAX(n_chars), SUM(n_chars) "
        f"FROM '{out}/documents.parquet'"
    ).fetchone()
    print(f"documents: {n} rows, median {med:.0f} chars, "
          f"max {mx} ({mx / med:.0f}x median), total {tot / 1e6:.1f} MB")
    vmed, vmax, big = con.execute(
        f"SELECT MEDIAN(value), MAX(value), "
        f"SUM(CASE WHEN value > 1e6 THEN 1 ELSE 0 END) "
        f"FROM '{out}/events.parquet'"
    ).fetchone()
    print(f"events.value: median {vmed:.2f}, max {vmax:.1f} "
          f"({vmax / max(vmed, 1e-9):.0f}x median), {big} rows above 1e6")
    return 0


if __name__ == "__main__":
    sys.exit(main())
