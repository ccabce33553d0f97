"""sf10 spot-run (r8): does the fixed-k = √n quantizer hold the
n^1.5 claim ANOTHER decade past the sf1 ladder?

The r7 ladder demonstrated at sf1 (20k vectors) that
``method='fixed', centroid_k=√n`` turns the modulo quantizer's
n²/mod assignment into n^1.5 (x281 filtered IVF: 17.2 s vs 59.1 s;
x149/x151 kNN chain: 19.6 s vs 93.8 s). This tool generates an
sf10-shaped embeddings table (10× sf1 = 200k vectors, same fitted
per-label gaussians, deterministic) and times the SAME fixed-k
configs at sf1 and sf10. n^1.5 predicts a ≤10^1.5 ≈ 31.6× wall
ratio for 10× data (queries grow n/100 with the corpus, so the
probe leg is (n/100)·n_probe·(n/√n) = O(n^1.5) too); fixed
overheads amortize, so healthy rows land well under that.

Usage: python tools/sf10_spot.py [--regen]
Writes LADDER_r9_sf10.json at the repo root (r9: re-measure after the
map-only k-best cell pick + probe-rank rewrite + one-pass mutual kNN;
r8 numbers preserved in LADDER_r8_sf10.json).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sfscale/sf1"
SF10 = "/tmp/sfscale/sf10"
SCALE = 100  # sf0.1 -> sf10 vector multiplier


def generate(path: str, scale: int = SCALE) -> None:
    """Scaled embeddings only — x281/x151 read nothing else. Same
    fitted-gaussian recipe as tools/scale_ladder.py's generate()."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    os.makedirs(path, exist_ok=True)
    con = duckdb.connect()
    emb = con.execute(
        "SELECT label, embedding FROM "
        f"read_parquet('{SF01}/embeddings.parquet')").fetchall()
    by_label: dict[int, list] = {}
    for lab, vec in emb:
        by_label.setdefault(lab, []).append(vec)
    labels = sorted(by_label)
    stats = {}
    for lab in labels:
        a = np.array(by_label[lab], dtype=np.float64)
        stats[lab] = (a.mean(axis=0), a.std(axis=0) + 1e-6,
                      len(a) / len(emb))
    n_vec = scale * len(emb)
    lab_draw = rng.choice(labels, size=n_vec,
                          p=[stats[b][2] for b in labels])
    dim = len(next(iter(stats.values()))[0])
    vecs = np.empty((n_vec, dim), dtype=np.float32)
    for i, lab in enumerate(lab_draw):
        mu, sd, _ = stats[lab]
        vecs[i] = (mu + rng.standard_normal(dim) * sd).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(lab_draw.astype(np.int32), pa.int32()),
    })
    pq.write_table(tbl, f"{path}/embeddings.parquet")
    print(f"# generated {n_vec} vectors at {path}", file=sys.stderr)


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF1}/embeddings.parquet"):
        generate(SF1, scale=SCALE // 10)
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF10}/embeddings.parquet"):
        generate(SF10)

    from kafana_spark.operators import dedup, similarity
    from kafana_spark.operators.registry import (
        ANN_K, ANN_N_ASSIGN, ANN_QUERY_MOD, FILTER_LABELS,
        FILTERED_N_PROBE, KNN_CLUSTER_MIN_COS, KNN_K, KNN_N_ASSIGN,
        KNN_N_PROBE,
    )
    from kafana_spark.session import get_spark
    from kafana_spark.sources.tables import load_table

    # Default local-mode heap is 1g — ~13 MB execution memory per
    # task at local[32], nothing like a real executor (a 1000-node
    # cluster gives each core ~1-2 GB). The sf10 legs sort/aggregate
    # the corpus×centroids expanded frame (89M rows); size the single
    # shared JVM like the per-core budget the 100 TB plan assumes.
    spark = get_spark("sf10-spot",
                      extra_conf={"spark.driver.memory": "48g"})
    spark.range(1000).count()

    def filtered_ivf_fixed(sf_dir: str):
        e = load_table(spark, sf_dir, "embeddings")
        n = e.count()
        q = similarity.modulo_queries(e, ANN_QUERY_MOD)
        return (similarity.filtered_ivf_topk(
            e, q, ANN_K, n_probe=FILTERED_N_PROBE,
            labels=FILTER_LABELS, n_assign=ANN_N_ASSIGN,
            method="fixed", centroid_k=int(math.isqrt(n)))
            .select("qid", "vec_id", "cos", "rank"))

    def knn_clusters_fixed(sf_dir: str):
        e = load_table(spark, sf_dir, "embeddings")
        n = e.count()
        return dedup.knn_clusters(
            e, k=KNN_K, method="fixed",
            centroid_k=int(math.isqrt(n)), n_probe=KNN_N_PROBE,
            n_assign=KNN_N_ASSIGN, min_cos=KNN_CLUSTER_MIN_COS)

    cases = {"x281_filtered_ivf_fixedk": filtered_ivf_fixed,
             "x151_knn_clusters_fixedk": knn_clusters_fixed}
    out: dict[str, dict] = {}
    for name, fn in cases.items():
        row: dict[str, float] = {}
        for tag, d in (("sf1", SF1), ("sf10", SF10)):
            best = None
            # min-of-2 warm at sf1 (the ladder discipline); single run
            # at sf10 — minutes-long runs amortize warm-up, and the
            # claim under test is an order-of-magnitude bound
            for _ in range(2 if tag == "sf1" else 1):
                t0 = time.time()
                nrows = len(fn(d).collect())
                el = time.time() - t0
                best = el if best is None or el < best else best
            row[tag] = round(best, 2)
            print(f"# {name} @ {tag}: {best:.2f}s rows={nrows}",
                  file=sys.stderr)
        row["ratio"] = round(row["sf10"] / row["sf1"], 2)
        row["n15_bound"] = 31.6
        out[name] = row
    result = {"metric": "sf10_fixedk_spot", "cases": out,
              "note": "10x data at fixed-k=sqrt(n); n^1.5 predicts "
                      "<=31.6x wall, fixed overheads amortize below"}
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "LADDER_r9_sf10.json"),
            "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
