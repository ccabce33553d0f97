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

r10 extension (verdict task 5): the minhash/text family — now the
suite's top cost — gets its own two-decade evidence. First finding
(this is the "names the mechanism" branch of the task): the fitted
recipe (vocab/length/dup-rate from sf0.1) CANNOT test the scaling
law, because sf0.1's documents carry a 31-WORD vocabulary. Freezing
31 words while scaling doc count 100x makes every doc weakly
similar to every other (the trigram space is ~31^3 and zipf-skewed
far smaller), so banded LSH candidates grow as n^2 x P(band
collision) with P scale-INVARIANT — a measured ~80 GB of candidate
shuffle at 500k docs. That is LSH's documented adversarial regime
(everything actually IS similar — boilerplate-heavy crawls hit it
for real; ``bucket_cap`` is the designed valve), not a pipeline
cost bug. So the minhash rows use two corpora:

- PLANTED (scaling-law rows): high-entropy background (fitted zipf
  shape x a 100-way salt, so random docs share ~no trigram) with
  exact dups AND near-dups (8% token mutation, J ~ 0.55) planted at
  a rate linear in n. Pairwise-similarity structure is
  scale-invariant, so a linear pipeline must show ~linear wall:
  x02-shaped banded minhash (bound: ~2x of linear = 20x at 10x
  data) and the x57-shaped stored-index serve (build-once
  amortization is the ratio between the two rows).
- FITTED/low-entropy (adversarial audit row): the quadratic term is
  QUANTIFIED by a linear-cost bucket audit — group the bands,
  sum B(B-1)/2 — plus the capped residual (what a bucket_cap=64 run
  would face), never by running the pair join into the disk.

Usage: python tools/sf10_spot.py [--regen]
Writes LADDER_r10_sf10.json at the repo root (r9 numbers preserved
in LADDER_r9_sf10.json).
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
SF1P = "/tmp/sfscale/sf1p"     # planted-dup high-entropy documents
SF10P = "/tmp/sfscale/sf10p"
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


def generate_docs(path: str, scale: int, planted: bool = False) -> None:
    """Scaled documents for the minhash rows. Token draws are batched
    into ONE rng.choice call: per-doc choice(p=...) re-sets up the
    sampler per document (O(docs x vocab)); one call for the whole
    corpus is O(total_tokens x log vocab).

    ``planted=False`` — the fitted recipe (vocab/lengths/dup rate
    from sf0.1, 31 words). At scale this is the adversarial
    everything-similar corpus (see module docstring); only the
    linear-cost bucket AUDIT may touch it.

    ``planted=True`` — the scaling-law corpus: each fitted-zipf base
    word gets a uniform 100-way salt (vocab 31 -> 3100, trigram
    space ~3e10), so two random 54-token docs share a shingle with
    P ~ 1e-7 and band collisions are ~only the planted structure:
    exact dups (text copies) and near-dups (8% token mutation ->
    trigram survival .92^3 ~ .78 -> J ~ .64, above the 0.5 verify
    threshold) each planted at sf0.1's dup RATE (linear in n)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    os.makedirs(path, exist_ok=True)
    con = duckdb.connect()
    vocab = con.execute(
        "SELECT tok, COUNT(*) c FROM (SELECT unnest(string_split(text,"
        f"' ')) tok FROM read_parquet('{SF01}/documents.parquet')) "
        "GROUP BY tok ORDER BY tok").fetchall()
    words = np.array([v[0] for v in vocab])
    wp = np.array([v[1] for v in vocab], dtype=float)
    wp /= wp.sum()
    lens = np.array([r[0] for r in con.execute(
        "SELECT len(string_split(text, ' ')) FROM "
        f"read_parquet('{SF01}/documents.parquet')").fetchall()])
    n_src, n_dup_src = con.execute(
        "SELECT COUNT(*), COUNT(*) - COUNT(DISTINCT text) FROM "
        f"read_parquet('{SF01}/documents.parquet')").fetchone()
    n_docs = scale * n_src
    n_dup = scale * n_dup_src
    doc_lens = rng.choice(lens, size=n_docs)
    draws = rng.choice(words, size=int(doc_lens.sum()), p=wp)
    if planted:
        # vectorized salt append: lut-indexed '%02d' strings, C-speed
        lut = np.array([f"{i:02d}" for i in range(100)])
        draws = np.char.add(np.char.add(draws.astype("U"), "_"),
                            lut[rng.integers(0, 100, size=len(draws))])
    bounds = np.cumsum(doc_lens)[:-1]
    texts = [" ".join(part) for part in np.split(draws, bounds)]
    picks = rng.choice(np.arange(1, n_docs), size=2 * n_dup,
                       replace=False)
    for i in picks[:n_dup]:
        texts[i] = texts[int(i) // 2]
    if planted:
        # near-dups: mutate 8% of the source's tokens in place
        for i in picks[n_dup:]:
            toks = np.array(texts[int(i) // 2].split(" "))
            m = rng.random(len(toks)) < 0.08
            if m.any():
                toks[m] = np.char.add(
                    np.char.add(rng.choice(words, size=int(m.sum()))
                                .astype("U"), "_"),
                    lut[rng.integers(0, 100, size=int(m.sum()))])
            texts[i] = " ".join(toks)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{path}/documents.parquet")
    print(f"# generated {n_docs} documents at {path} "
          f"(planted={planted})", file=sys.stderr)


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF1}/embeddings.parquet"):
        generate(SF1, scale=SCALE // 10)
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF10}/embeddings.parquet"):
        generate(SF10)
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF1}/documents.parquet"):
        generate_docs(SF1, scale=SCALE // 10)
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF10}/documents.parquet"):
        generate_docs(SF10, scale=SCALE)
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF1P}/documents.parquet"):
        generate_docs(SF1P, scale=SCALE // 10, planted=True)
    if "--regen" in sys.argv or not os.path.exists(
            f"{SF10P}/documents.parquet"):
        generate_docs(SF10P, scale=SCALE, planted=True)

    from pyspark.sql import functions as F

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

    def minhash_neardup(sf_dir: str):
        d = load_table(spark, sf_dir, "documents")
        return dedup.minhash_near_dup(d, 0.5)

    def bucket_audit(sf_dir: str) -> dict:
        """Linear-cost quantification of the low-entropy corpus'
        quadratic term: band the corpus (shingle -> signature ->
        lsh_bands, all linear), group the buckets, and SUM the pair
        counts a candidate join would face — uncapped and under
        bucket_cap=64 — without ever materializing a pair."""
        d = load_table(spark, sf_dir, "documents")
        sh = dedup.hashed_shingle_set(d)
        bands = dedup.lsh_bands(dedup.minhash_signature(sh))
        row = (bands.groupBy("band", "bkey")
               .agg(F.count(F.lit(1)).alias("b"))
               .agg(F.sum(F.expr("b*(b-1)/2")).alias("pairs"),
                    F.sum(F.expr("CASE WHEN b <= 64 THEN b*(b-1)/2 "
                                 "ELSE 0 END")).alias("pairs_cap64"),
                    F.max("b").alias("max_bucket"),
                    F.count(F.lit(1)).alias("buckets"))
               .collect()[0])
        # the DOMINANT quadratic term is not the bucket pairs but the
        # verify leg's inverted-index self-join: sum df(df-1)/2 over
        # shingle doc-frequencies — on this corpus every doc is some
        # pair's candidate, so the cand-id prune removes nothing and
        # this IS the join's row count (the measured ~80 GB spill)
        vrow = (sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
                .agg(F.sum(F.expr("df*(df-1)/2")).alias("vr"),
                     F.max("df").alias("max_df")).collect()[0])
        return {"pairs": int(row["pairs"]),
                "pairs_cap64": int(row["pairs_cap64"]),
                "max_bucket": int(row["max_bucket"]),
                "buckets": int(row["buckets"]),
                "verify_join_rows": int(vrow["vr"]),
                "max_shingle_df": int(vrow["max_df"])}

    _idx_built: dict[str, str] = {}

    def _dedup_index_for(sf_dir: str) -> str:
        from kafana_spark import dedup_index

        if sf_dir not in _idx_built:
            root = f"/tmp/sfscale/ndidx_{os.path.basename(sf_dir)}"
            if not os.path.exists(root):
                t0 = time.time()
                dedup_index.build_dedup_index(
                    load_table(spark, sf_dir, "documents"), root)
                print(f"# dedup index build @ {sf_dir}: "
                      f"{time.time() - t0:.2f}s", file=sys.stderr)
            _idx_built[sf_dir] = root
        return _idx_built[sf_dir]

    def stored_neardup_serve(sf_dir: str):
        from kafana_spark import dedup_index

        return dedup_index.near_dup_from_index(
            spark, _dedup_index_for(sf_dir), 0.5)

    # ANN rows run on the fitted embeddings (SF1/SF10); the minhash
    # scaling-law rows run on the PLANTED corpora (SF1P/SF10P) — the
    # fitted 31-word documents are everything-similar at scale (see
    # module docstring) and get the linear-cost audit below instead
    cases = {"x281_filtered_ivf_fixedk": (filtered_ivf_fixed, 31.6,
                                          "n^1.5 (fixed-k=sqrt(n))",
                                          (SF1, SF10)),
             "x151_knn_clusters_fixedk": (knn_clusters_fixed, 31.6,
                                          "n^1.5 (fixed-k=sqrt(n))",
                                          (SF1, SF10)),
             "x02_minhash_neardup": (minhash_neardup, 20.0,
                                     "~2x of linear (banded LSH, "
                                     "planted-dup corpus)",
                                     (SF1P, SF10P)),
             "x57_stored_neardup_serve": (stored_neardup_serve, 20.0,
                                          "~2x of linear (stored bands"
                                          "+shingles, no rehash)",
                                          (SF1P, SF10P))}
    # optional subset: positional case names (r12 — re-measure the
    # minhash rows after the shingle-shape fix without re-running the
    # ANN rows and the audit)
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    if only:
        unknown = [k for k in only if k not in cases]
        if unknown:
            raise SystemExit(f"unknown cases: {unknown}")
        cases = {k: v for k, v in cases.items() if k in only}

    out: dict[str, dict] = {}
    for name, (fn, bound, law, dirs) in cases.items():
        row: dict[str, float] = {}
        for tag, d in (("sf1", dirs[0]), ("sf10", dirs[1])):
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
        row["bound"] = bound
        row["law"] = law
        out[name] = row
    if only:
        # subset mode: print the measured rows only; do NOT overwrite
        # the r10 record file
        print(json.dumps({"metric": "sf10_spot_subset", "cases": out}))
        os._exit(0)  # spark.stop() hangs after results print

    audit = {}
    for tag, d in (("sf1", SF1), ("sf10", SF10)):
        t0 = time.time()
        audit[tag] = bucket_audit(d)
        audit[tag]["audit_secs"] = round(time.time() - t0, 2)
        print(f"# lowent_bucket_audit @ {tag}: {audit[tag]}",
              file=sys.stderr)
    audit["pairs_ratio"] = round(
        audit["sf10"]["pairs"] / max(1, audit["sf1"]["pairs"]), 1)
    audit["verify_rows_ratio"] = round(
        audit["sf10"]["verify_join_rows"]
        / max(1, audit["sf1"]["verify_join_rows"]), 1)
    audit["note"] = (
        "fitted 31-word-vocab corpus: BOTH quadratic terms of the "
        "adversarial everything-similar regime, quantified — bucket "
        "candidate pairs (pairs; pairs_cap64 = the bounded residual "
        "bucket_cap=64 leaves) and the verify leg's inverted-index "
        "self-join volume (verify_join_rows = sum df(df-1)/2 over "
        "shingle doc-frequencies; the cand-id prune removes nothing "
        "when every doc is a candidate — this is the term that "
        "spilled ~80 GB). Mechanism, not pipeline cost. The audit "
        "itself is two linear groupBys — it never materializes a "
        "pair.")
    out["lowent_bucket_audit"] = audit
    result = {"metric": "sf10_fixedk_spot", "cases": out,
              "note": "10x data; ANN rows bound by n^1.5 = 31.6x at "
                      "fixed-k=sqrt(n), minhash rows by ~2x of linear "
                      "= 20x on the planted-dup high-entropy corpus "
                      "(banded pipeline, nothing quadratic); the "
                      "fitted-vocab corpus' quadratic candidate term "
                      "is quantified by the linear-cost bucket audit"}
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "LADDER_r10_sf10.json"),
            "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
