"""hash_fn A/B pricing (r9 verdict task 6 / NOTES_r10 §4).

Times `minhash_near_dup` at sf0.1 with hash_fn="md5" (the
DuckDB-replayable oracle contract) vs "xxhash64" (the production
setting) min-of-N warm, with host load per run, and asserts the two
settings produce identical near-dup output (the parity contract the
unit test pins on the fixture corpus, re-checked here at bench SF).

Usage: python tools/hash_ab.py          # prints one JSON line
Env:   HASH_AB_RUNS (default 3), SPARK_GRAFT_SF_DIR
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_runs = int(os.environ.get("HASH_AB_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kafana_spark.operators import dedup
    from kafana_spark.session import get_spark
    from kafana_spark.sources.tables import load_table

    spark = get_spark("kafana-hash-ab")
    spark.range(1000).count()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long").count())

    docs = load_table(spark, sf_dir, "documents")
    out: dict = {"sf_dir": sf_dir, "runs": n_runs}
    results: dict[str, list] = {}
    for fn in ("md5", "xxhash64"):
        secs, loads = [], []
        rows = None
        for _ in range(n_runs):
            t0 = time.time()
            rows = sorted(map(tuple, dedup.minhash_near_dup(
                docs, 0.5, hash_fn=fn).collect()))
            secs.append(round(time.time() - t0, 2))
            loads.append(round(os.getloadavg()[0], 1))
        results[fn] = rows
        out[fn] = {"secs": secs, "min": min(secs), "load1": loads,
                   "rows": len(rows)}
    out["parity"] = results["md5"] == results["xxhash64"]
    # md5_min / xxhash64_min: >1 means xxhash64 is FASTER (r10 ADVICE
    # flagged the old key name as inverted)
    out["speedup_xxhash64_over_md5"] = round(
        out["md5"]["min"] / out["xxhash64"]["min"], 2)
    print(json.dumps(out))
    spark.stop()
    if not out["parity"]:
        raise SystemExit("PARITY FAILURE: md5 vs xxhash64 outputs differ")


if __name__ == "__main__":
    main()
