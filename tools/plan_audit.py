"""Registry-wide physical-plan audit — the systematic version of the
per-query decomposition that caught r10's double scan+pack and the
44-scan serve plans.

For every queries() key, builds the DataFrame (plan only — nothing
executes except the handful of serve keys that materialize bounded
intermediates at call time) and records structural counters:

- scans:    "Scan parquet" occurrences (re-embedded subplans show up
            as scan multiplication)
- exch:     Exchange occurrences (shuffles)
- cart:     CartesianProduct present
- bnlj:     BroadcastNestedLoopJoin present
- py:       Python-boundary operators (ArrowEvalPython / MapInPandas /
            FlatMapGroupsInPandas / BatchEvalPython)
- sort:     global Sort (non-TakeOrdered) count

Prints one JSON line per key plus a summary of outliers (keys above
the scan / exchange thresholds). Exit code 1 if any key trips the
hard gates (cartesian or nested-loop join on a non-exempt key).

INTERPRETATION (r11, measured): the static counters are a TRIAGE
list, not verdicts. (a) BroadcastNestedLoopJoin is benign when one
side is a 1-row aggregate (the crossJoin(broadcast(totals)) idiom all
the share_bp reports use) — the gate only matters when both sides
scale. (b) Static scan multiplication does NOT imply runtime
re-execution: subplans referenced from ONE DataFrame object carry
identical exprIds, so their exchanges canonicalize equal and runtime
ReusedExchange heals them — including PythonUDF stages (the x06
failure was two SEPARATELY-BUILT frames, which never canonicalize).
Measured: eagerly materializing the x168 funnel stages (174 static
scans, the audit's worst key) REGRESSED sf0.1 wall 7.57→11.2 s —
reuse was already covering it, and the checkpoints added barriers.
Confirm re-execution at RUNTIME (zero ReusedExchange in the adaptive
executed plan, or wall-clock decomposition) before surgery.

Usage: python tools/plan_audit.py [sf_dir] [scan_threshold]
"""

from __future__ import annotations

import json
import os
import re
import sys
import traceback


def plan_of(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return qe.explainString(mode)


def audit(plan: str) -> dict:
    body = plan.split("== Physical Plan ==")[-1]
    return {
        "scans": len(re.findall(r"Scan parquet", body)),
        "exch": len(re.findall(r"\bExchange\b", body)),
        "cart": "CartesianProduct" in body,
        "bnlj": "BroadcastNestedLoopJoin" in body,
        "py": len(re.findall(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
            r"|BatchEvalPython", body)),
        "sort": len(re.findall(r"\bSort \[", body)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    scan_thr = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from kafana_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    rows, errors = {}, {}
    for key, fn in entry.queries().items():
        try:
            rows[key] = audit(plan_of(fn(spark, sf_dir)))
        except Exception as e:  # noqa: BLE001 - audit must not abort
            errors[key] = f"{type(e).__name__}: {e}"
            traceback.print_exc(file=sys.stderr)

    flagged = {k: v for k, v in rows.items()
               if v["scans"] > scan_thr or v["cart"] or v["bnlj"]}
    print(json.dumps({
        "n_keys": len(rows), "n_errors": len(errors),
        "scan_threshold": scan_thr,
        "max_scans": max((v["scans"], k) for k, v in rows.items()),
        "max_exch": max((v["exch"], k) for k, v in rows.items()),
        "flagged": flagged, "errors": errors,
    }))
    for k in sorted(rows, key=lambda k: -rows[k]["scans"])[:15]:
        print(json.dumps({"key": k, **rows[k]}), file=sys.stderr)
    # hard gate: cartesian products only. BNLJ is NOT gated — the
    # registry's crossJoin(broadcast(1-row totals)) idiom compiles to
    # BroadcastNestedLoopJoin and is benign (see INTERPRETATION);
    # gating it would make the exit code permanently red.
    if any(v["cart"] for v in flagged.values()):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
