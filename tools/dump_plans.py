"""Dump .explain("formatted") for a set of queries() keys to files.

Used to produce the committed plans/r{N}/<key>_{before,after}.txt
evidence: run once from a worktree pinned at the pre-change commit
(suffix "before") and once at HEAD (suffix "after").

Usage: python tools/dump_plans.py <outdir> <suffix> <key> [key ...]

Plans are built at sf0.001 (plan SHAPE is scale-independent; only
AQE runtime re-planning varies, and explain here is the static
physical plan the optimizer chose).
"""

from __future__ import annotations

import os
import sys


def plan_of(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return qe.explainString(mode)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entry
    from kafana_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark()
    qs = entry.queries()
    for k in keys:
        try:
            plan = plan_of(qs[k](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 - record, keep going
            plan = f"ERROR building {k}: {exc!r}\n"
        path = os.path.join(outdir, f"{k}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
