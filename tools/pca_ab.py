"""A/B the PCA sufficient-statistics pass: r11 map-only Arrow kernel
vs the pre-r11 posexplode self-join (n·d² rows through an exchange).

Synthesizes an n-row µunit corpus (the sf embeddings tables are tiny:
2k rows at sf0.1 — too small to show the asymptotic gap), runs both
shapes min-of-RUNS warm, asserts the (sj, S, n) statistics are
IDENTICAL, and prints one JSON line.

Usage: python tools/pca_ab.py [n_rows] [dim] [runs] [shapes]
``shapes``: comma list of kernel,join (default both). Exactness is
asserted only when both run. At 200k×64 the join side GC-thrashes on
its 819M-row exchange and did not finish inside 590 s on the r11 box
— run it alone with a generous timeout if you need the number.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def old_moments(corpus: DataFrame, dim: int):
    """The pre-r11 shape, verbatim: posexplode + self equi-join on
    vec_id (n·d² intermediate rows) reduced by groupBy."""
    ex = corpus.select("vec_id", F.posexplode("vu").alias("j", "x"))
    sj = {int(r.j): int(r.s)
          for r in ex.groupBy("j").agg(F.sum("x").alias("s"))
          .collect()}
    gram = (ex.alias("a")
            .join(ex.alias("b"), F.col("a.vec_id") == F.col("b.vec_id"))
            .groupBy(F.col("a.j").alias("j"), F.col("b.j").alias("k"))
            .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("s")))
    S = {(int(r.j), int(r.k)): int(r.s) for r in gram.collect()}
    return sj, S, corpus.count()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    shapes = (sys.argv[4].split(",") if len(sys.argv) > 4
              else ["kernel", "join"])

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from kafana_spark.operators.similarity import _pca_moments
    from kafana_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # deterministic synthetic µunit corpus: entries in [-1e6, 1e6]
    from pyspark import StorageLevel

    corpus = (spark.range(n_rows).withColumnRenamed("id", "vec_id")
              .select("vec_id", F.expr(
                  f"transform(sequence(1, {dim}), i -> "
                  "CAST(pmod(hash(vec_id * 131071 + i), 2000001) "
                  "- 1000000 AS BIGINT))").alias("vu"))
              .repartition(32)
              # disk-backed: a 1M x 64 bigint-array corpus blows the
              # memory-only store before the kernel ever runs
              .persist(StorageLevel.MEMORY_AND_DISK))
    corpus.count()

    out = {"n_rows": n_rows, "dim": dim,
           "cpus": os.cpu_count(), "shapes": {}}
    results = {}
    todo = {"kernel": ("kernel_r11", _pca_moments),
            "join": ("join_pre_r11", old_moments)}
    for s in shapes:
        name, fn = todo[s]
        secs, loads = [], []
        for _ in range(runs):
            t0 = time.time()
            results[name] = fn(corpus, dim)
            secs.append(round(time.time() - t0, 2))
            loads.append(round(os.getloadavg()[0], 1))
        out["shapes"][name] = {"secs": secs, "min": min(secs),
                               "load1": loads}
    if len(results) == 2:
        out["exact_match"] = (results["kernel_r11"]
                              == results["join_pre_r11"])
        out["speedup_kernel_over_join"] = round(
            out["shapes"]["join_pre_r11"]["min"]
            / out["shapes"]["kernel_r11"]["min"], 2)
    print(json.dumps(out))
    if len(results) == 2 and not out["exact_match"]:
        raise SystemExit("EXACTNESS FAILURE: kernel != join statistics")


if __name__ == "__main__":
    main()
