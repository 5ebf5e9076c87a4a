"""Physical-plan audit: sweep every contract query for scale antipatterns.

Run:  python tools/plan_audit.py [sf_dir] [query ...]

For each `__spark_entry__.queries()` entry this prints a one-line verdict
and flags:

* ``CARTESIAN``   — CartesianProduct / BroadcastNestedLoopJoin on non-tiny
  inputs (intentional for scalar-subquery broadcasts; flagged for review).
* ``PY_ROW_UDF``  — row-at-a-time BatchEvalPython in the plan (the input
  mandate is Arrow-vectorized only; ArrowEvalPython / MapInPandas are OK).
* ``NO_PUSHDOWN`` — a parquet scan whose query filters produced no
  PushedFilters entry.
* ``SINGLE_PART`` — an Exchange SinglePartition outside a global aggregate
  / LIMIT collect (a scale chokepoint if it carries the full table).

Exit code 1 if any query trips PY_ROW_UDF (hard fail); other flags are
informational (some are correct by design — e.g. the tiny scalar-average
broadcast in tpch_q22).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BNL_JOIN")
    if re.search(r"BatchEvalPython", plan):
        flags.append("PY_ROW_UDF")
    if "Exchange SinglePartition" in plan:
        flags.append("SINGLE_PART")
    # every FileScan carrying DataFilters should push at least one of them
    for scan in re.finditer(r"FileScan parquet [^\n]*", plan):
        s = scan.group(0)
        if "DataFilters: [" in s and "DataFilters: []" not in s:
            if "PushedFilters: []" in s:
                flags.append("NO_PUSHDOWN")
                break
    return flags


def _node_depth(line: str) -> int:
    """Tree depth of a plan line = length of its box-drawing prefix."""
    m = re.match(r"^[\s:+|-]*", line)
    return len(m.group(0))


def semi_below_pair_agg(plan: str) -> bool:
    """True iff the LSH candidate restriction sits INSIDE the subtree of
    the HashAggregate that produces ``n_common`` — i.e. candidates prune
    below the pair aggregation instead of after it (the difference between
    near-linear and near-quadratic at 10^12 docs).  Accepted evidence,
    either shape:

    * a LeftSemi join under the aggregate (pair/key semi-restriction), or
    * a join keyed on the candidate pair's ``a`` column (the pair-driven
      form: cands ⋈ shingles(a) ⋈ shingles(b, shingle), which never
      enumerates non-candidate pairs at all), or
    * the array-intersect form (round 3): ``n_common`` comes from
      ``array_intersect`` over per-doc ``collect_set`` arrays, and the
      candidate restriction must sit below THAT aggregate — a
      ``collect_set`` HashAggregate with a LeftSemi in its subtree.

    A plain shingle-keyed self-join under the aggregate (round-1 shape)
    matches none of these and fails.
    """
    cand_join = re.compile(r"Join (?:\w+ )*\[a#\d+")
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Aggregate" in ln and ("n_common" in ln or "collect_set" in ln):
            d = _node_depth(ln)
            for nxt in lines[i + 1 :]:
                if nxt.strip() and _node_depth(nxt) <= d:
                    break  # left the aggregate's subtree
                if "LeftSemi" in nxt or cand_join.search(nxt):
                    return True
            return False
    return False


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as m
    from gujarati_readability_pagewise_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]")
    hard_fail = False
    for name, fn in m.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            hard_fail = True
            continue
        flags = audit(plan)
        if name == "dedup_verified_pairs" and not semi_below_pair_agg(plan):
            flags.append("SEMI_ABOVE_AGG")
            hard_fail = True
        if "PY_ROW_UDF" in flags:
            hard_fail = True
        print(f"{'FLAG' if flags else 'ok  '} {name}: {','.join(flags) or 'clean'}")
    spark.stop()
    return 1 if hard_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
