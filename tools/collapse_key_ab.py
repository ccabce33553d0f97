"""A/B dedup._COLLAPSE_KEY ("hash" = 32-byte sha2 join key for the
exact-collapse rep<->member joins, r12; "text" = the legacy full-text
key) on the minhash-family consumers. Interleaved round-robin, full
registry query timed bench-style, parity on sorted rows, per-run
loads. x03 (ngram — no exact collapse in its DAG) rides as control.

Usage: python tools/collapse_key_ab.py [min_of] [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafana_spark.operators import dedup  # noqa: E402
from kafana_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "x02_minhash_near_dup", "x24_dup_clusters", "x46_canonical_docs",
    "x56_curation_v2", "x157_source_dup_matrix",
    "x03_ngram_jaccard_dup",  # control: no exact collapse in its DAG
]


def main() -> None:
    argv = sys.argv[1:]
    min_of = int(argv[0]) if argv else 3
    keys = argv[1:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    spark = get_spark("collapse-key-ab")
    spark.range(1000).count()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long").count())

    qmap = entrymod.queries()
    # save/restore the caller's value rather than a hardcoded "hash":
    # if the production default ever changes, the finally block must
    # not silently force the old key (r12 ADVICE).
    orig_key = dedup._COLLAPSE_KEY
    secs: dict[tuple[str, str], list[float]] = {}
    loads: dict[tuple[str, str], list[float]] = {}
    rows_by: dict[tuple[str, str], list] = {}
    for rnd in range(min_of):
        for key in keys:
            for arm in ("hash", "text"):
                dedup._COLLAPSE_KEY = arm
                try:
                    spark.sparkContext.setJobDescription(
                        f"{key} collapse-{arm} r{rnd}")
                    loads.setdefault((key, arm), []).append(
                        round(os.getloadavg()[0], 2))
                    t0 = time.time()
                    df = qmap[key](spark, sf_dir)
                    rows = sorted(map(tuple, df.collect()))
                    dt = round(time.time() - t0, 3)
                    secs.setdefault((key, arm), []).append(dt)
                    rows_by[(key, arm)] = rows
                    print(f"# {key} collapse-{arm} r{rnd}: {dt:.3f}s "
                          f"load1={os.getloadavg()[0]:.2f}", flush=True)
                except Exception as exc:  # noqa: BLE001
                    print(f"# ERROR {key} collapse-{arm} r{rnd}: "
                          f"{type(exc).__name__}: {exc}"[:300],
                          file=sys.stderr)
                finally:
                    dedup._COLLAPSE_KEY = orig_key
                    spark.sparkContext.setJobDescription(None)
    for key in keys:
        h = secs.get((key, "hash"), [])
        t = secs.get((key, "text"), [])
        if not h or not t:
            print(f"{key:24s} INCOMPLETE hash={h} text={t}")
            continue
        parity = ("OK" if rows_by[(key, "hash")] == rows_by[(key, "text")]
                  else "MISMATCH")
        ratio = min(h) / min(t) if min(t) else float("nan")
        print(f"{key:24s} hash={min(h):7.3f} {h} text={min(t):7.3f} "
              f"{t} hash/text={ratio:.2f} parity={parity} "
              f"load1={loads[(key, 'hash')] + loads[(key, 'text')]}")
    print("load1 end", os.getloadavg()[0])
    spark.stop()


if __name__ == "__main__":
    main()
