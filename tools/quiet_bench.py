"""Quiet-box bench adjudication (r9 verdict task 3).

THIN WRAPPER over bench.py (r11 verdict #5: driver runs and
adjudication runs must share one timing code path — half of every
judge round's perf section was re-litigating ambient noise measured
two different ways). Equivalent to:

    python bench.py --min-of $QUIET_BENCH_RUNS --detail [key ...]

Default keys: the historical watch set + flat controls. Compare each
key's "min" against the BENCH_local_r{N}.json history; if the controls
are inflated too, it's the box, not the code.
"""

from __future__ import annotations

import os
import sys

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
    n_runs = os.environ.get("QUIET_BENCH_RUNS", "3")

    import bench

    bench.main(["--min-of", n_runs, "--detail", *keys],
               stop_session=False)
    os._exit(0)  # spark.stop() hangs after results print (verify doc)


if __name__ == "__main__":
    main()
