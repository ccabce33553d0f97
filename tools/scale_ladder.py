"""Scale-factor ladder: one evidence point beyond plan shape for the
100 TB design claims.

Generates an sf1-SHAPED documents/embeddings pair (10x the sf0.1 row
counts, same distributions — token frequencies, length mix, lang/source
spread, duplicate rate, per-label embedding clusters are all fitted
from the real sf0.1 fixtures; numpy seed 42, fully deterministic) under
/tmp/sfscale/sf1, then times the heavy dedup / ANN / text families at
sf0.1 and sf1 and prints per-query ratios.

Reading the output: data grows 10x, so a banded/bucketed plan should
scale ~linearly (ratio ~10x or less once fixed overheads amortize);
anything super-linear names its shuffle. x06 is INCLUDED as the known
quadratic — it is the documented exhaustive verify twin of x68, and its
~100x ratio is the point of the comparison.

Usage: python tools/scale_ladder.py [--regen]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
BIG = "/tmp/sfscale/sf1"
SCALE = 10  # sf0.1 -> sf1 row-count multiplier

#: (key, expected) — expected is the documented scaling class
LADDER = [
    ("x01_dedup_keep_first", "linear (hash-groupBy on sha2)"),
    ("x02_minhash_near_dup", "~linear (banded candidates)"),
    ("x03_ngram_jaccard_dup", "~linear (banded candidates)"),
    ("x68_embedding_near_dup_bucketed", "~linear (per-cell squares)"),
    ("x06_embedding_near_dup", "QUADRATIC by design (verify twin)"),
    ("x07_ann_brute_force", "linear (corpus x fixed query set)"),
    ("x08_ann_ivf", "linear (probed cells only)"),
    ("x81_ann_lsh", "linear (bucketed candidates)"),
    ("x88_bm25_topk", "linear (matched pairs only)"),
    ("x295_msearch", "linear (N queries share ONE tf/df scan — the "
     "batching amortization over x88's single-query cost)"),
    ("x139_hybrid_rrf", "linear (BM25 leg + exact-cosine leg with a "
     "FIXED query; bounded full-outer fusion)"),
    ("x91_percolate", "linear (fixed registered-query set x corpus "
     "token match — the alerting loop's full-scan shape)"),
    ("x298_binary_ann", "corpus x queries like x07 but at dim/8 "
     "BYTES per pair (two bit_count words) — the queries grow n/100 "
     "with the corpus, so expect the x07 shape at a fraction of the "
     "constant; the fixed_queries budget is the at-scale config"),
    ("x280_filtered_knn", "the exact filtered twin: |eligible| x "
     "queries, both growing with the corpus — the x07-class "
     "quadratic, kept as the recall truth"),
    ("x281_filtered_ivf", "the scale path: one label-blind index, "
     "probe-time predicate + 2x over-probe; modulo cells at the "
     "gate config, so the assignment leg carries the same n^2/mod "
     "story as x08 (fixed-k is the knob)"),
    ("x69_exact_substr", "~linear (sharded gram join)"),
    ("x33_pair_counts", "linear (combinable counts)"),
    ("x136_bpe_merge_train", "linear x N rounds (combinable counts)"),
    ("x145_kmeans_refine", "linear x N rounds (broadcast assignment; "
     "cells grow with n so per-pair work rises ~n/40 per round)"),
    ("x149_knn_graph", "fixed-k cells (r6 s3): assignment linear "
     "(n x k), probe side n x n_probe x (n/k) — k pinned at the gate "
     "corpus, so expect SUPER-linear here unless k is raised ~sqrt(n) "
     "as the operator docs prescribe; the ladder shows the knob "
     "matters, which is the point of surfacing it"),
    ("x151_knn_clusters", "~linear (n*k mutual edges + CC on the "
     "pruned edge list)"),
    ("x158_lang_fair_gate", "n log n within lang partitions (exact "
     "percentile rank)"),
    ("x162_gopher_rules", "linear (map-side rules + one (doc,bigram) "
     "combinable count)"),
    ("x181_funnel", "linear (per-step filtered MIN per user, "
     "broadcast-free equi chain)"),
    ("x182_retention", "linear (distinct user-day collapse first)"),
    ("x184_event_transitions", "linear (one per-user window, "
     "|types|^2 aggregate)"),
    ("x185_rolling_active", "linear x window_days (bounded explode "
     "on the collapsed user-day frame)"),
    ("x186_rfm_segments", "linear (r7: distinct-value-group cuts — "
     "windows ride bounded metric domains, never the user frame)"),
    ("x287_scd2_dim", "linear (per-key windows; the change collapse "
     "drops the frame before the version pass)"),
    ("x296_stored_scd2", "serve = re-collapse + version tail over the "
     "STORED changes-only frame (tiny vs the event stream; the "
     "registry builder also pays the 2-batch build once per corpus)"),
    ("x187_error_spike", "linear + hour-series window (series "
     "length is clock time, not event count)"),
    ("x190_acf", "linear collapse + lag-join on the day series"),
    ("x197_bot_flags", "linear (per-user window + combinable "
     "moments)"),
    ("x201_session_paths", "linear (two per-user windows, "
     "combinable path counts)"),
    ("x204_session_cooccurrence", "linear (per-session type sets "
     "<= |types| rows each)"),
    ("x167_pca_power", "linear (Gram pass n*d^2 -> d^2 combinable "
     "cells; iteration is driver-side on the d x d table)"),
    ("x172_stored_gates", "build linear, serve ~constant (combinable "
     "aggregate over stored booleans)"),
    ("x240_pricing_summary", "linear (one scan, map-side combinable, "
     "6 groups)"),
    ("x241_top_revenue_orders", "linear (pushed filters, orderkey "
     "shuffle, TakeOrdered top-k)"),
    ("x242_regional_volume", "linear (fact joins on keys; dims "
     "broadcast)"),
    ("x246_supplier_hhi", "linear (two bounded combinable "
     "aggregates)"),
    ("x255_daily_revenue_running", "linear collapse + calendar-length "
     "day-series window (rows/day grow, series does not)"),
    ("x257_priority_order_profile", "linear (bounded-NDV distinct-"
     "value groups; windows over value groups only)"),
    ("x260_brand_affinity", "linear (within-order pairs bounded by "
     "lines-per-order squared)"),
]


def generate(path: str) -> None:
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    os.makedirs(path, exist_ok=True)
    con = duckdb.connect()

    # ---- documents: fit vocab, lengths, lang/source from sf0.1
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
    langs, lp = zip(*con.execute(
        "SELECT lang, COUNT(*) FROM "
        f"read_parquet('{SF01}/documents.parquet') GROUP BY lang "
        "ORDER BY lang").fetchall())
    lp = np.array(lp, dtype=float) / sum(lp)
    srcs, sp = zip(*con.execute(
        "SELECT source, COUNT(*) FROM "
        f"read_parquet('{SF01}/documents.parquet') GROUP BY source "
        "ORDER BY source").fetchall())
    sp = np.array(sp, dtype=float) / sum(sp)
    n_dup = SCALE * con.execute(
        "SELECT COUNT(*) - COUNT(DISTINCT text) FROM "
        f"read_parquet('{SF01}/documents.parquet')").fetchone()[0]

    n_docs = SCALE * con.execute(
        "SELECT COUNT(*) FROM "
        f"read_parquet('{SF01}/documents.parquet')").fetchone()[0]
    doc_lens = rng.choice(lens, size=n_docs)
    texts = [" ".join(rng.choice(words, size=k, p=wp))
             for k in doc_lens]
    # duplicate injection at the fitted rate (copy earlier texts)
    for i in rng.choice(np.arange(1, n_docs), size=n_dup, replace=False):
        texts[i] = texts[int(i) // 2]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(langs, size=n_docs, p=lp)),
        "source": pa.array(rng.choice(srcs, size=n_docs, p=sp)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{path}/documents.parquet")

    # ---- embeddings: per-label gaussian clusters fitted from sf0.1
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
    n_vec = SCALE * len(emb)
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

    # ---- events: fitted type/value distributions, same 30-day span,
    # 10x rows over 10x users (per-user event rate held constant — the
    # realistic growth axis; the event family's windows partition by
    # user, so this is the honest test of that claim)
    types, tp = zip(*con.execute(
        "SELECT event_type, COUNT(*) FROM "
        f"read_parquet('{SF01}/events.parquet') GROUP BY event_type "
        "ORDER BY event_type").fetchall())
    tp = np.array(tp, dtype=float) / sum(tp)
    vals = np.array([r[0] for r in con.execute(
        "SELECT value FROM "
        f"read_parquet('{SF01}/events.parquet')").fetchall()])
    t0_us, t1_us = con.execute(
        "SELECT epoch_us(MIN(ts)), epoch_us(MAX(ts)) FROM "
        f"read_parquet('{SF01}/events.parquet')").fetchone()
    n_ev, n_users = con.execute(
        "SELECT COUNT(*), COUNT(DISTINCT user_id) FROM "
        f"read_parquet('{SF01}/events.parquet')").fetchone()
    n_big = SCALE * n_ev
    ts_us = np.sort(rng.integers(t0_us, t1_us, size=n_big))
    tbl = pa.table({
        "event_id": pa.array(np.arange(n_big), pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, SCALE * n_users, size=n_big), pa.int64()),
        "event_type": pa.array(rng.choice(types, size=n_big, p=tp)),
        "value": pa.array(rng.choice(vals, size=n_big), pa.float64()),
        "props": pa.array(
            ['{"k": %d}' % v for v in rng.integers(0, 100, n_big)]),
    })
    pq.write_table(tbl, f"{path}/events.parquet")

    # ---- relational star schema: 10x key-shifted tiling. Each copy
    # offsets every surrogate key by i*(max+1), so join integrity,
    # per-key fan-outs, and value distributions are preserved EXACTLY
    # — the honest growth axis for the x240+ family (dates and the
    # constant nation/region dims unchanged: days get 10x denser, the
    # day-series windows stay calendar-length).
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SF01}/{t}.parquet')) "
            f"TO '{path}/{t}.parquet' (FORMAT PARQUET)")
    ok, ck, pk, sk = (con.execute(
        f"SELECT MAX({c}) + 1 FROM read_parquet('{SF01}/{t}.parquet')"
    ).fetchone()[0] for c, t in (
        ("o_orderkey", "orders"), ("c_custkey", "customer"),
        ("p_partkey", "part"), ("s_suppkey", "supplier")))
    tiles = ", ".join(f"({i})" for i in range(SCALE))
    tiled = {
        "customer": (f"SELECT c_custkey + i * {ck} AS c_custkey, "
                     "c_name || '#' || i AS c_name, c_nationkey, "
                     "c_acctbal, c_mktsegment"),
        "supplier": (f"SELECT s_suppkey + i * {sk} AS s_suppkey, "
                     "s_name || '#' || i AS s_name, s_nationkey, "
                     "s_acctbal"),
        "part": (f"SELECT p_partkey + i * {pk} AS p_partkey, p_name, "
                 "p_brand, p_type, p_size, p_retailprice"),
        "orders": (f"SELECT o_orderkey + i * {ok} AS o_orderkey, "
                   f"o_custkey + i * {ck} AS o_custkey, o_orderstatus, "
                   "o_totalprice, o_orderdate, o_orderpriority"),
        "lineitem": (f"SELECT l_orderkey + i * {ok} AS l_orderkey, "
                     f"l_partkey + i * {pk} AS l_partkey, "
                     f"l_suppkey + i * {sk} AS l_suppkey, "
                     "l_linenumber, l_quantity, l_extendedprice, "
                     "l_discount, l_tax, l_returnflag, l_linestatus, "
                     "l_shipdate"),
    }
    for t, sel in tiled.items():
        con.execute(
            f"COPY ({sel} FROM read_parquet('{SF01}/{t}.parquet'), "
            f"(VALUES {tiles}) tile(i)) "
            f"TO '{path}/{t}.parquet' (FORMAT PARQUET)")
    n_li = con.execute(f"SELECT COUNT(*) FROM "
                       f"read_parquet('{path}/lineitem.parquet')"
                       ).fetchone()[0]
    print(f"# generated {n_docs} docs / {n_vec} vectors / "
          f"{n_big} events / {n_li} lineitems at {path}",
          file=sys.stderr)


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(
            f"{BIG}/documents.parquet"):
        generate(BIG)

    import __spark_entry__ as m
    from kafana_spark.session import get_spark

    # 10x data in a single local JVM needs a real heap (the default 1g
    # driver heap is sized for sf0.1); a cluster would spread this
    # across executors
    spark = get_spark("scale-ladder",
                      extra_conf={"spark.driver.memory": "64g"})
    spark.range(1000).count()
    (spark.range(64).repartition(32)
     .mapInPandas(lambda it: it, "id long").count())
    qs = m.queries()
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = {}
    for key, expected in LADDER:
        if only and key not in only:
            continue
        row = {"expected": expected}
        try:
            for tag, sfd in (("sf0.1", SF01), ("sf1", BIG)):
                best = None
                for _ in range(2):
                    t0 = time.time()
                    len(qs[key](spark, sfd).collect())
                    el = time.time() - t0
                    best = el if best is None or el < best else best
                row[tag] = round(best, 2)
            row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9),
                                 1)
            print(f"# {key}: {row['sf0.1']}s -> {row['sf1']}s "
                  f"({row['ratio']}x; {expected})", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            row["error"] = f"{type(exc).__name__}: {exc}"[:200]
            print(f"# {key}: ERROR {row['error']}", file=sys.stderr)
        out[key] = row
    print(json.dumps({"scale": SCALE, "queries": out}))


if __name__ == "__main__":
    main()
