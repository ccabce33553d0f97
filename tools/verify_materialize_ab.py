"""A/B the jaccard_verify tail's materialization discipline on x35's
shape (guide §1: measure the variants before changing the operator).

Variants (all compute identical results — same joins, same arithmetic):
  v0  baseline: fully lazy (HEAD behavior)
  v1  pairs.persist()               — cache the candidate list
  v2  serve_materialize(pairs)      — eager localCheckpoint, lineage cut
  v3  v1 + sh_v.persist()           — also cache the pruned index
  v4  v2 + sh_v.persist()

Each variant min-of-N with the noop sink; parity checked (sorted rows).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafana_spark.operators import dedup  # noqa: E402
from kafana_spark.operators.registry import _docs, NEAR_DUP_THRESHOLD  # noqa: E402
from kafana_spark.session import get_spark, serve_materialize  # noqa: E402


def verify_variant(pairs, sh, threshold, mat_pairs=None, mat_shv=False):
    key = "h" if "h" in sh.columns else "s"
    if mat_pairs == "ckpt":
        pairs = serve_materialize(pairs)
    cand_ids = (pairs.select(F.col("da").alias("doc_id"))
                .unionByName(pairs.select(F.col("db").alias("doc_id")))
                .distinct())
    sh_v = sh.join(cand_ids, "doc_id", "left_semi")
    if mat_shv:
        sh_v = serve_materialize(sh_v)
    sizes = sh_v.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (sh_v.alias("x").join(sh_v.alias("y"),
                                  F.col(f"x.{key}") == F.col(f"y.{key}"))
             .where(F.col("x.doc_id") < F.col("y.doc_id"))
             .groupBy(F.col("x.doc_id").alias("da"),
                      F.col("y.doc_id").alias("db"))
             .agg(F.count(F.lit(1)).alias("i")))
    joined = (pairs.join(inter, ["da", "db"])
              .join(sizes.withColumnRenamed("doc_id", "da")
                    .withColumnRenamed("n", "na"), "da")
              .join(sizes.withColumnRenamed("doc_id", "db")
                    .withColumnRenamed("n", "nb"), "db"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (joined.select("da", "db", F.round(jac, 4).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def main() -> None:
    min_of = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("verify-mat-ab")
    spark.range(1000).count()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long").count())

    d = _docs(spark, sf_dir)
    new = d.where(F.col("doc_id") % 2 == 1)
    old = d.where(F.col("doc_id") % 2 == 0)

    def build(mat_pairs, mat_shv):
        sh_new = dedup.hashed_shingle_set(new)
        new_ids = sh_new.select("doc_id").distinct()
        sh_old = (dedup.hashed_shingle_set(old)
                  .join(F.broadcast(new_ids), "doc_id", "left_anti"))
        bn = dedup.lsh_bands(dedup.minhash_signature(sh_new))
        bo = dedup.lsh_bands(dedup.minhash_signature(sh_old))
        cand = (bn.alias("a").join(bo.alias("b"), ["band", "bkey"])
                .select(F.least("a.doc_id", "b.doc_id").alias("da"),
                        F.greatest("a.doc_id", "b.doc_id").alias("db"))
                .where(F.col("da") < F.col("db"))
                .distinct())
        return verify_variant(cand, sh_new.unionByName(sh_old),
                              NEAR_DUP_THRESHOLD,
                              mat_pairs=mat_pairs, mat_shv=mat_shv)

    variants = {
        "v0 lazy (HEAD)": (None, False),
        "v2 pairs ckpt": ("ckpt", False),
        "v5 ckpt+shv ckpt": ("ckpt", True),
        "v6 shv ckpt only": (None, True),
    }
    # interleaved round-robin: ambient drift hits every variant alike
    secs: dict[str, list[float]] = {k: [] for k in variants}
    rows_by: dict[str, list] = {}
    for rnd in range(min_of):
        for name, (mp, ms) in variants.items():
            spark.sparkContext.setJobDescription(f"{name} r{rnd}")
            t0 = time.time()
            df = build(mp, ms)
            rows = sorted(map(tuple, df.collect()))
            secs[name].append(round(time.time() - t0, 3))
            rows_by[name] = rows
            spark.sparkContext.setJobDescription(None)
    ref = rows_by["v0 lazy (HEAD)"]
    for name in variants:
        parity = "OK" if rows_by[name] == ref else "MISMATCH"
        print(f"{name:18s} min={min(secs[name]):6.3f} "
              f"runs={secs[name]} rows={len(rows_by[name])} "
              f"parity={parity}")
    print("load1", os.getloadavg()[0])
    spark.stop()


if __name__ == "__main__":
    main()
