"""A/B the r12 jaccard_verify serve boundaries (ckpt_pairs/ckpt_index,
default ON since fe2645d) on the CURATION-FUNNEL consumers the vtail
commit did not measure (it A/B'd the direct dedup keys x35/x79/x24/
x02/x46/x157/x124 only).

Mechanism under test: inside a funnel's single executed plan, runtime
ReusedExchange already deduplicates the lazy dedup-gate cascade (the
r11 x168 materialization A/B: eager ckpts REGRESSED 7.57->11.2 s, 18
ReusedExchange nodes in the executed plan). The eager boundaries cut
that plan into several serialized jobs that cannot share exchanges
across job boundaries, so the shingle/quality passes may run extra
times exactly where the lazy plan healed them.

Arms (identical results by the knob-parity test):
  on   — HEAD defaults (ckpt_pairs=True, ckpt_index=True)
  off  — both knobs forced False via a jaccard_verify wrapper
         (= the pre-fe2645d lazy tail for every default-knob caller)

Interleaved round-robin (ambient drift hits both arms alike), full
registry query timed bench-style (build + collect), an untouched
control key records ambient, loads sampled per run.

History note (r12 ADVICE, then r13): between the 9ae8032 call-site
fix and the r13 restructure, x124 passed ckpt_pairs/ckpt_index=False
explicitly, so both arms were identical for that key (a re-run then
could not reproduce the documented 1.22x and should not be read as
the regression vanishing). Since the r13 lsh_eval_counts restructure
x124's verify tail runs with knob DEFAULTS over a checkpointed
shingle index, so the A/B is live for it again — with a different
(smaller) expected effect.

Usage: python tools/funnel_vtail_ab.py [min_of] [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafana_spark.operators import dedup  # noqa: E402
from kafana_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "x168_curation_v5", "x176_curation_impact", "x161_curation_v4",
    "x124_dedup_eval", "x56_curation_v2", "x78_curation_v3",
    "x153_cluster_terms",  # control: no jaccard_verify in its DAG
]

_ORIG_VERIFY = dedup.jaccard_verify


def _verify_ckpt_off(pairs, sh, threshold, prune=True, pair_first=False,
                     ckpt_pairs=True, ckpt_index=True):
    # force the pre-r12 lazy tail regardless of caller defaults
    return _ORIG_VERIFY(pairs, sh, threshold, prune=prune,
                        pair_first=pair_first,
                        ckpt_pairs=False, ckpt_index=False)


def main() -> None:
    argv = sys.argv[1:]
    min_of = int(argv[0]) if argv else 3
    keys = argv[1:] or DEFAULT_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod

    spark = get_spark("funnel-vtail-ab")
    spark.range(1000).count()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long").count())

    qmap = entrymod.queries()
    secs: dict[tuple[str, str], list[float]] = {}
    loads: dict[tuple[str, str], list[float]] = {}
    rows_by: dict[tuple[str, str], list] = {}
    for rnd in range(min_of):
        for key in keys:
            for arm in ("on", "off"):
                dedup.jaccard_verify = (
                    _ORIG_VERIFY if arm == "on" else _verify_ckpt_off)
                try:
                    spark.sparkContext.setJobDescription(
                        f"{key} ckpt-{arm} r{rnd}")
                    loads.setdefault((key, arm), []).append(
                        round(os.getloadavg()[0], 2))
                    t0 = time.time()
                    df = qmap[key](spark, sf_dir)
                    rows = sorted(map(tuple, df.collect()))
                    dt = round(time.time() - t0, 3)
                    secs.setdefault((key, arm), []).append(dt)
                    rows_by[(key, arm)] = rows
                    # incremental: a session death must not erase the
                    # rounds already measured (first run lost 84 runs)
                    print(f"# {key} ckpt-{arm} r{rnd}: {dt:.3f}s "
                          f"load1={os.getloadavg()[0]:.2f}", flush=True)
                except Exception as exc:  # noqa: BLE001 — one bad run
                    # must not void the interleaved design (a transient
                    # executor loss would otherwise erase every timing)
                    print(f"# ERROR {key} ckpt-{arm} r{rnd}: "
                          f"{type(exc).__name__}: {exc}"[:300],
                          file=sys.stderr)
                finally:
                    dedup.jaccard_verify = _ORIG_VERIFY
                    spark.sparkContext.setJobDescription(None)
    for key in keys:
        on = secs.get((key, "on"), [])
        off = secs.get((key, "off"), [])
        if not on or not off:
            print(f"{key:24s} INCOMPLETE on={on} off={off}")
            continue
        parity = ("OK" if rows_by[(key, "on")] == rows_by[(key, "off")]
                  else "MISMATCH")
        ratio = min(on) / min(off) if min(off) else float("nan")
        print(f"{key:24s} on={min(on):7.3f} {on} off={min(off):7.3f} "
              f"{off} on/off={ratio:.2f} parity={parity} "
              f"load1={loads[(key, 'on')] + loads[(key, 'off')]}")
    print("load1 end", os.getloadavg()[0])
    spark.stop()


if __name__ == "__main__":
    main()
