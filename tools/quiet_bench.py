"""Quiet-box bench adjudication (r9 verdict task 3).

Runs a named subset of registry queries min-of-N warm (default 3) with
host load recorded before/after EACH query, so a "code or box?" bench
regression can be adjudicated from one JSON blob instead of a round of
judge time. Usage:

    python tools/quiet_bench.py [key ...]     # default: the r9 watch
                                              # set + flat controls

Prints one JSON line: {key: {"secs": [..], "min": s, "load1": [..]},
..., "host": {...}}. Compare "min" against the BENCH_local_r{N}.json
history; the controls (untouched trivial queries) calibrate ambient
inflation — if controls are inflated too, it's the box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# r9 watch set (VERDICT "What's wrong" #2) + flat controls
DEFAULT_KEYS = [
    "x06_embedding_near_dup", "x97_mmr_rerank", "x57_stored_near_dup",
    "x79_snm_near_dup", "x80_weighted_sample", "x98_function_score",
    "x99_collapse",
    # controls: untouched, historically flat
    "x01_dedup_keep_first", "x02_minhash_near_dup",
    "x22_suppliers_by_region",
]


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    n_runs = int(os.environ.get("QUIET_BENCH_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    import __spark_entry__ as entrymod
    from kafana_spark.session import get_spark

    qmap = entrymod.queries()
    missing = [k for k in keys if k not in qmap]
    if missing:
        raise SystemExit(f"unknown keys: {missing}")

    spark = get_spark("kafana-quiet-bench")
    spark.range(1000).count()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long").count())

    j0 = bench._cpu_jiffies()
    out: dict = {}
    for k in keys:
        secs, loads = [], []
        for _ in range(n_runs):
            loads.append(round(os.getloadavg()[0], 2))
            t0 = time.time()
            len(qmap[k](spark, sf_dir).collect())
            secs.append(round(time.time() - t0, 3))
        out[k] = {"secs": secs, "min": min(secs), "load1": loads}
        print(f"# {k}: min={min(secs):.3f}s runs={secs} load1={loads}",
              file=sys.stderr)
    out["host"] = {
        "n_cpus": os.cpu_count(),
        "load1_end": round(os.getloadavg()[0], 2),
        **bench._host_delta(j0, bench._cpu_jiffies()),
    }
    print(json.dumps(out))
    os._exit(0)  # spark.stop() hangs after results print (verify doc)


if __name__ == "__main__":
    main()
