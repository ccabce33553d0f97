"""A/B the two jaccard_verify intersection shapes ON THE REGIME EACH
ONE IS FOR (r11).

The natural-entropy side is already measured (x02 at sf0.1: default
self-join 6.8 s vs pair-first 9.8 s — quiet_bench, control flat).
This tool measures the LOW-ENTROPY side: the fitted 31-word-vocab
corpus (tools/sf10_spot.py's adversarial audit recipe), where every
doc shares shingles with every other, shingle doc-frequencies are
corpus-sized, and the default shape's Σ_h df² self-join goes
quadratic while the pair-first shape stays bounded by the
bucket-capped candidate list × doc length.

Generates scale×5000 fitted docs, runs the minhash front end ONCE
with bucket_cap (the documented valve for this regime), materializes
the candidate list, then times each verify shape min-of-RUNS warm and
asserts identical output. The default shape gets a per-run wall guard
(SHAPE_TIMEOUT_S) — on this corpus it may simply not finish; that IS
the result.

r12: also records the AUTO selector's inputs and decision
(``verify_shape_estimates`` → Σ_h df² vs Σ_pairs |A|, the same code
jaccard_verify(pair_first="auto") runs) and asserts auto picked the
shape this tool measured as faster. Set ``VERIFY_AB_CORPUS=<dir>`` to
run against a real documents.parquet (the natural-entropy regime)
instead of generating the fitted corpus.

Usage: python tools/verify_shape_ab.py [scale] [bucket_cap] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHAPE_TIMEOUT_S = int(os.environ.get("SHAPE_TIMEOUT_S", "240"))


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    bucket_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    bucket_cap = bucket_cap if bucket_cap > 0 else None  # 0 = no cap
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from sf10_spot import generate_docs

    from kafana_spark.operators import dedup
    from kafana_spark.session import get_spark

    path = os.environ.get("VERIFY_AB_CORPUS")
    corpus = "natural" if path else "fitted"
    if not path:
        path = f"/tmp/verify_ab_fitted_x{scale}"
        if not os.path.exists(f"{path}/documents.parquet"):
            generate_docs(path, scale, planted=False)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{path}/documents.parquet")

    sh = dedup.hashed_shingle_set(docs)
    pairs = (dedup.candidate_pairs(
        dedup.lsh_bands(dedup.minhash_signature(sh)),
        bucket_cap=bucket_cap)
        .localCheckpoint(eager=True))   # same candidates to both shapes
    n_pairs = pairs.count()

    out = {"corpus": corpus, "n_docs": docs.count(),
           "bucket_cap": bucket_cap,
           "n_cand_pairs": n_pairs, "cpus": os.cpu_count(),
           "shape_timeout_s": SHAPE_TIMEOUT_S, "shapes": {}}

    # The auto selector's view: same pruned-index estimates that
    # jaccard_verify(pair_first="auto") computes.
    from pyspark.sql import functions as F

    key = "h" if "h" in sh.columns else "s"
    cand_ids = (pairs.select(F.col("da").alias("doc_id"))
                .unionByName(pairs.select(F.col("db").alias("doc_id")))
                .distinct())
    sh_v = sh.join(cand_ids, "doc_id", "left_semi").persist()
    est_self, est_pf = dedup.verify_shape_estimates(pairs, sh_v, key)
    auto_pf = est_self > max(dedup.AUTO_SHAPE_FLOOR,
                             dedup.AUTO_SHAPE_RATIO * est_pf)
    sh_v.unpersist()
    out["auto"] = {"est_selfjoin": est_self, "est_pair_first": est_pf,
                   "ratio": round(est_self / max(1, est_pf), 2),
                   "picks_pair_first": auto_pf}
    results = {}
    for name, pf in (("pair_first", True), ("default_selfjoin", False)):
        secs, loads = [], []
        for _ in range(runs):
            t0 = time.time()
            try:
                results[name] = sorted(map(
                    tuple,
                    dedup.jaccard_verify(pairs, sh, 0.5, pair_first=pf)
                    .collect()))
            except Exception as e:  # noqa: BLE001 - record, don't die
                # keep any already-measured runs alongside the error,
                # and drop the stale result so parity is only computed
                # from fully successful shapes (r11 ADVICE: a warm-run
                # failure used to erase the first run's timings yet
                # leave its rows feeding the parity check)
                out["shapes"][name] = {
                    "error": f"{type(e).__name__}",
                    "secs": secs, "load1": loads}
                results.pop(name, None)
                break
            dt = time.time() - t0
            secs.append(round(dt, 2))
            loads.append(round(os.getloadavg()[0], 1))
            if dt > SHAPE_TIMEOUT_S:
                out["shapes"][name] = {
                    "secs": secs, "min": min(secs), "load1": loads,
                    "note": f"exceeded {SHAPE_TIMEOUT_S}s guard; "
                            "remaining runs skipped"}
                break
        else:
            out["shapes"][name] = {"secs": secs, "min": min(secs),
                                   "load1": loads, "rows": len(
                                       results[name])}
    if len(results) == 2:
        out["parity"] = results["pair_first"] == results[
            "default_selfjoin"]
    # auto must match the measured-better shape when both completed;
    # when the default DNF'd/errored, auto must have picked pair_first
    mins = {n: s.get("min") for n, s in out["shapes"].items()
            if s.get("min") is not None and "error" not in s}
    if len(mins) == 2:
        faster_is_pf = mins["pair_first"] <= mins["default_selfjoin"]
        out["auto"]["matches_measured"] = auto_pf == faster_is_pf
    elif "pair_first" in mins:
        out["auto"]["matches_measured"] = auto_pf
    print(json.dumps(out))
    if out.get("parity") is False:
        raise SystemExit("PARITY FAILURE between verify shapes")
    if out["auto"].get("matches_measured") is False:
        raise SystemExit("AUTO SHAPE MISMATCH: selector picked the "
                         "measured-slower shape")


if __name__ == "__main__":
    main()
