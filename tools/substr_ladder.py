"""ExactSubstr family sf10 ladder (r12 — the twice-carried verdict
item): x69/x76 are the one heavy dedup family never measured at 10×.

Uses the PLANTED high-entropy corpora from tools/sf10_spot.py
(SF1P = 10× sf0.1 docs, SF10P = 100×; exact dups + 8%-mutation
near-dups planted at sf0.1's linear rate) so pairwise-duplication
structure is scale-invariant and a linear pipeline must show ~linear
wall.

Rows (each min-of-2 warm):
- inline x69 shape: ``exact_substr_spans`` full chain (gram explode →
  dup-hash count → coverage semi-join → islands merge)
- index build: ``build_substr_index`` (the pay-once positional gram
  store)
- stored x76 shape: ``spans_from_index`` serve (count + semi-join +
  islands, no text read)

Mechanism probes (linear-cost audits, run once per corpus): corpus
gram rows, |duplicated-gram set|, coverage rows (= Σ df over
duplicated grams), and max gram df — the two named super-linearity
candidates are the duplicated-gram SET size and the gram df
DISTRIBUTION (a fat head df makes coverage rows grow faster than n).

Usage: python tools/substr_ladder.py [--regen]
Prints one JSON blob; paste into LADDER_r12.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF1P = "/tmp/sfscale/sf1p"
SF10P = "/tmp/sfscale/sf10p"


def main() -> None:
    from sf10_spot import generate_docs

    for path, scale in ((SF1P, 10), (SF10P, 100)):
        if "--regen" in sys.argv or not os.path.exists(
                f"{path}/documents.parquet"):
            generate_docs(path, scale, planted=True)

    os.environ.setdefault("KAFANA_SPARK_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from kafana_spark import dedup_index
    from kafana_spark.operators import dedup
    from kafana_spark.session import get_spark

    spark = get_spark("substr-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    out: dict = {"corpora": {}, "rows": {}}

    def timed(fn, runs=2):
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None or el < best else best
        return round(best, 2)

    for tag, path in (("sf1p", SF1P), ("sf10p", SF10P)):
        docs = spark.read.parquet(f"{path}/documents.parquet")

        # mechanism probes (one linear pass each)
        g = dedup.positional_gram_index(docs)
        df_counts = (g.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
                     .persist())
        probe = df_counts.agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            F.sum("df").alias("n_gram_rows"),
            F.max("df").alias("max_df"),
            F.sum(F.when(F.col("df") >= 2, F.col("df"))).alias(
                "coverage_rows"),
            F.sum(F.when(F.col("df") >= 2, 1)).alias(
                "n_dup_grams")).first().asDict()
        df_counts.unpersist()
        out["corpora"][tag] = {
            "n_docs": docs.count(),
            **{k: int(v or 0) for k, v in probe.items()}}

        root = f"/tmp/sfscale/subidx_{tag}"
        if os.path.exists(root):
            shutil.rmtree(root)
        row = {
            "inline_spans_s": timed(
                lambda: dedup.exact_substr_spans(docs).count()),
            "index_build_s": timed(
                lambda: (shutil.rmtree(root, ignore_errors=True),
                         dedup_index.build_substr_index(docs, root)),
                runs=1),
            "stored_serve_s": timed(
                lambda: dedup_index.spans_from_index(spark, root)
                .count()),
        }
        print(f"# {tag}: {json.dumps(row)}", file=sys.stderr)
        out["rows"][tag] = row

    for op in ("inline_spans_s", "index_build_s", "stored_serve_s"):
        out["rows"][f"ratio_{op}"] = round(
            out["rows"]["sf10p"][op] / max(out["rows"]["sf1p"][op],
                                           1e-9), 2)
    for k in ("n_gram_rows", "n_dup_grams", "coverage_rows", "max_df"):
        out["corpora"][f"ratio_{k}"] = round(
            out["corpora"]["sf10p"][k] / max(out["corpora"]["sf1p"][k],
                                             1), 2)
    print(json.dumps(out))
    os._exit(0)  # spark.stop() hangs after results print (verify doc)


if __name__ == "__main__":
    main()
