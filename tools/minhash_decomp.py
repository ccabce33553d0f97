"""Stage-by-stage decomposition of the minhash near-dup pipeline
(x35 incremental / x02 full) at bench SF — guide §1: measure before
touching the family.

Each numbered leg is a PREFIX of the full pipeline timed with the noop
sink (build + execute, warm session, min-of-N); successive differences
apportion cost per stage. Job descriptions label the UI/event log.

Usage: python tools/minhash_decomp.py [min_of]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafana_spark.operators import dedup  # noqa: E402
from kafana_spark.operators.registry import _docs, NEAR_DUP_THRESHOLD  # noqa: E402
from kafana_spark.session import get_spark  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, build, min_of):
    secs = []
    for _ in range(min_of):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        noop(build())
        secs.append(round(time.time() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(f"{name:34s} min={min(secs):6.3f}  runs={secs}")
    return min(secs)


def main() -> None:
    min_of = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minhash-decomp")
    spark.range(1000).count()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long").count())

    d = _docs(spark, sf_dir)
    new = d.where(F.col("doc_id") % 2 == 1)
    old = d.where(F.col("doc_id") % 2 == 0)

    def sh_new():
        return dedup.hashed_shingle_set(new)

    def sh_old():
        sn = dedup.hashed_shingle_set(new)
        ids = sn.select("doc_id").distinct()
        return (dedup.hashed_shingle_set(old)
                .join(F.broadcast(ids), "doc_id", "left_anti"))

    def sig_new():
        return dedup.minhash_signature(sh_new())

    def bands_both():
        bn = dedup.lsh_bands(dedup.minhash_signature(sh_new()))
        bo = dedup.lsh_bands(dedup.minhash_signature(sh_old()))
        return bn.unionByName(bo)

    def cand():
        bn = dedup.lsh_bands(dedup.minhash_signature(sh_new()))
        bo = dedup.lsh_bands(dedup.minhash_signature(sh_old()))
        return (bn.alias("a").join(bo.alias("b"), ["band", "bkey"])
                .select(F.least("a.doc_id", "b.doc_id").alias("da"),
                        F.greatest("a.doc_id", "b.doc_id").alias("db"))
                .where(F.col("da") < F.col("db"))
                .distinct())

    def full():
        return dedup.incremental_near_dup(new, old, NEAR_DUP_THRESHOLD)

    # row counts once, for context (df of index frames)
    n_sh = sh_new().count()
    n_cand = cand().count()
    print(f"rows: sh_new={n_sh} cand_pairs={n_cand}")

    timed(spark, "1 shingle+md5 (new side only)", sh_new, min_of)
    timed(spark, "2 + signature (new)", sig_new, min_of)
    timed(spark, "3 + bands (both sides)", bands_both, min_of)
    timed(spark, "4 + candidate join+distinct", cand, min_of)
    timed(spark, "5 full x35 (verify tail)", full, min_of)

    # x02 for comparison: the collapse_exact full pipeline
    def x02():
        return dedup.minhash_near_dup(d, NEAR_DUP_THRESHOLD)

    timed(spark, "6 full x02 minhash_near_dup", x02, min_of)
    print("load1", os.getloadavg()[0])
    spark.stop()


if __name__ == "__main__":
    main()
