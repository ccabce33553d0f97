"""Core-scaling ladder (r12 verdict #4): 8-core vs 32-core wall at
10x data for the top-cost families.

The driver's own low-core bench runs at sf0.1, where the suite is
fixed-overhead-bound (plan construction, scheduling floors, JVM
costs) — 8-core ~= 32-core, structurally uninformative. This tool
times the heavy legs on the PLANTED 10x corpus (/tmp/sfscale/sf1,
fitted from sf0.1 by tools/scale_ladder.py — same generator, numpy
seed 42, deterministic) at two core counts, each in its OWN
subprocess (a Spark master is fixed per JVM), and reports the
low/high-core wall ratio per key. A parallel operator should read
well above 1 (ideally -> cores_hi/cores_lo as compute dominates); a
ratio near 1 at 10x data names a serial bottleneck.

Usage:
  python tools/core_ladder.py                  # orchestrates both arms
  python tools/core_ladder.py --worker key...  # one arm (internal)

Env: CORE_LADDER_KEYS (comma list), CORE_LADDER_CPUS (default "8,32"),
CORE_LADDER_DATA (corpus dir, default /tmp/sfscale/sf1 — use the PLANTED
sf1p/sf10p for scaling-law rows; the fitted sf1 is the documented
adversarial low-entropy corpus), CORE_LADDER_REPS (interleaved arm
repeats),
KAFANA_SPARK_DRIVER_MEM passes through (default 48g here — 10x data
in one local JVM needs a real heap; a cluster spreads this).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BIG = os.environ.get("CORE_LADDER_DATA", "/tmp/sfscale/sf1")

DEFAULT_KEYS = [
    "x35_incremental_near_dup",   # minhash verify tail over NEW x OLD
    "x02_minhash_near_dup",       # the family's batch shape
    "x81_ann_lsh",                # LSH signing + bucketed candidates
    "x56_curation_v2",            # curation funnel (multi-gate DAG)
]


def _steal_jiffies() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def _shapes():
    """Direct pipeline shapes for the PLANTED corpora (text-only
    schema — registry keys needing lang/quality columns can't run
    there). Key prefix "s:"."""
    from pyspark.sql import functions as F

    from kafana_spark.operators import dedup

    def docs(spark):
        return (spark.read.parquet(f"{BIG}/documents.parquet")
                .select("doc_id", "text"))

    return {
        "s:x02_minhash": lambda spark, _:
            dedup.minhash_near_dup(docs(spark), 0.5),
        "s:x03_ngram": lambda spark, _:
            dedup.ngram_jaccard_dup(
                docs(spark).repartition(256), 0.5),
        "s:x35_incremental": lambda spark, _:
            dedup.incremental_near_dup(
                docs(spark).where(F.col("doc_id") % 20 == 0),
                docs(spark).where(F.col("doc_id") % 20 != 0), 0.5),
    }


def worker(keys: list[str]) -> None:
    import __spark_entry__ as m
    from kafana_spark.session import get_spark

    spark = get_spark("core-ladder")
    spark.range(1000).count()
    (spark.range(64).repartition(int(os.environ["SPARK_GRAFT_CPUS"]))
     .mapInPandas(lambda it: it, "id long").count())
    qs = m.queries()
    qs = {**qs, **_shapes()}
    out = {}
    st0, tot0 = _steal_jiffies()
    for key in keys:
        spark.sparkContext.setJobDescription(f"core-ladder {key}")
        best = None
        for _ in range(2):
            t0 = time.time()
            len(qs[key](spark, BIG).collect())
            el = time.time() - t0
            best = el if best is None or el < best else best
        out[key] = round(best, 2)
        print(f"# {key}: {best:.2f}s "
              f"(local[{os.environ['SPARK_GRAFT_CPUS']}])",
              file=sys.stderr)
    st1, tot1 = _steal_jiffies()
    out["_steal_pct"] = round(100.0 * (st1 - st0) /
                              max(1, tot1 - tot0), 2)
    out["_load1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


def main() -> None:
    if "--worker" in sys.argv:
        keys = [a for a in sys.argv[1:] if not a.startswith("--")]
        worker(keys or DEFAULT_KEYS)
        return

    if not os.path.exists(f"{BIG}/documents.parquet"):
        from tools.scale_ladder import generate
        generate(BIG)

    keys = (os.environ.get("CORE_LADDER_KEYS", "").split(",")
            if os.environ.get("CORE_LADDER_KEYS") else DEFAULT_KEYS)
    cpus = [c.strip() for c in
            os.environ.get("CORE_LADDER_CPUS", "8,32").split(",")]
    reps = int(os.environ.get("CORE_LADDER_REPS", "1"))
    arms: dict[str, dict[str, float]] = {}
    telemetry: list[dict] = []
    for c in cpus * reps:
        env = dict(os.environ,
                   SPARK_GRAFT_CPUS=c,
                   KAFANA_SPARK_DRIVER_MEM=os.environ.get(
                       "KAFANA_SPARK_DRIVER_MEM", "48g"))
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             *keys],
            env=env, capture_output=True, text=True, cwd=REPO)
        for line in p.stderr.splitlines():
            if line.startswith("# "):
                print(f"[{c}c] {line}", file=sys.stderr)
        last = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not last:
            print(f"ARM local[{c}] FAILED rc={p.returncode}:\n"
                  + p.stderr[-2000:], file=sys.stderr)
            continue
        got = json.loads(last[-1])
        telemetry.append({"cpus": c,
                          "steal_pct": got.pop("_steal_pct", None),
                          "load1": got.pop("_load1", None)})
        prev = arms.get(c)
        arms[c] = ({k: min(v, prev.get(k, v)) for k, v in got.items()}
                   if prev else got)

    lo, hi = cpus[0], cpus[-1]
    rows = {}
    for key in keys:
        a, b = arms.get(lo, {}).get(key), arms.get(hi, {}).get(key)
        rows[key] = {f"wall_{lo}c": a, f"wall_{hi}c": b,
                     "lo_over_hi": round(a / b, 2) if a and b else None}
    print(json.dumps({"data": BIG, "cpus": cpus, "reps": reps,
                      "rows": rows, "arm_telemetry": telemetry}))


if __name__ == "__main__":
    main()
