"""Deterministic sampling + vocab operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafana_spark.operators import text as T
from kafana_spark.operators.sample import (
    deterministic_sample,
    stratified_sample,
)
from kafana_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_sample_is_deterministic_and_nested(spark):
    d = docs(spark)
    a1 = {r.doc_id for r in deterministic_sample(d, 0.3).collect()}
    a2 = {r.doc_id for r in deterministic_sample(d, 0.3).collect()}
    b = {r.doc_id for r in deterministic_sample(d, 0.6).collect()}
    assert a1 == a2                      # reproducible across runs
    assert a1 <= b                       # fractions nest at same seed
    n = d.count()
    assert 0.15 * n < len(a1) < 0.45 * n
    # a different seed draws an (almost surely) different sample
    c = {r.doc_id for r in deterministic_sample(d, 0.3, seed=7).collect()}
    assert c != a1


def test_sample_is_row_property_not_pass_property(spark):
    """Sampling a SUBSET keeps exactly the intersection — incremental
    re-runs keep decisions stable."""
    d = docs(spark)
    full = {r.doc_id for r in deterministic_sample(d, 0.4).collect()}
    half = d.where(F.col("doc_id") % 2 == 0)
    sub = {r.doc_id for r in deterministic_sample(half, 0.4).collect()}
    assert sub == {i for i in full if i % 2 == 0}


def test_stratified_sample_respects_per_stratum_fractions(spark):
    d = docs(spark)
    out = stratified_sample(d, {"en": 1.0, "zh": 0.0}, default=0.5)
    got = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    base = {r.lang: r.cnt for r in
            d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got.get("en", 0) == base["en"]          # keep-all stratum
    assert "zh" not in got                         # drop-all stratum
    for lang, n in base.items():
        if lang in ("en", "zh") or n < 20:
            continue
        assert 0.2 * n < got.get(lang, 0) < 0.8 * n


def test_vocab_topk_rank_and_monotone_counts(spark):
    out = T.vocab_topk(docs(spark), k=10).orderBy("rk").collect()
    assert len(out) == 10
    assert [r.rk for r in out] == list(range(1, 11))
    cnts = [r.cnt for r in out]
    assert cnts == sorted(cnts, reverse=True)


def test_pack_sequences_invariants(spark):
    from kafana_spark.operators.pack import pack_sequences

    budget = 64
    d = docs(spark)
    out = pack_sequences(d, budget=budget).collect()
    n_docs = d.count()
    # every doc exactly once
    assert sorted(r.doc_id for r in out) == sorted(
        r.doc_id for r in d.select("doc_id").collect())
    seqs = {}
    for r in out:
        seqs.setdefault(r.seq_id, []).append(r)
    for sid, rows in seqs.items():
        total = sum(r.n_tokens for r in rows)
        assert all(r.seq_tokens == total and r.seq_docs == len(rows)
                   for r in rows)
        # budget respected unless a single over-budget doc owns the seq
        assert total <= budget or len(rows) == 1
    # packing actually packs: fewer sequences than documents
    assert len(seqs) < n_docs


def test_redact_tags_planted_pii(spark):
    from kafana_spark.operators.text import redact

    df = spark.createDataFrame([
        (1, "contact me at jane.doe+x@example.org or +1-555-123-4567 ok"),
        (2, "served from 192.168.10.250 see https://ex.org/p?q=1 now"),
        (3, "nothing sensitive here at all"),
    ], ["doc_id", "text"])
    got = {r.doc_id: r for r in redact(df).collect()}
    assert "<email>" in got[1].redacted and "<phone>" in got[1].redacted
    assert "<ipv4>" in got[2].redacted and "<url>" in got[2].redacted
    assert got[3].redacted == "nothing sensitive here at all"
    assert got[1].was_redacted and got[2].was_redacted
    assert not got[3].was_redacted
    # no raw PII survives
    assert "example.org" not in got[1].redacted
    assert "192.168" not in got[2].redacted


def test_mixture_rebalance_equalizes_strata(spark):
    from kafana_spark.operators.sample import mixture_rebalance

    d = docs(spark)
    out = mixture_rebalance(d)
    by_lang = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    pre = {r.lang: r.n for r in
           d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    target = min(pre.values())
    # every stratum is leveled near the smallest one (hash-sampling
    # variance on a few hundred rows: allow a generous band)
    assert set(by_lang) == set(pre)
    for lang, n in by_lang.items():
        assert n <= pre[lang]
        assert abs(n - target) <= max(10, 0.35 * target), (lang, n, target)
    # deterministic across runs
    again = {r.lang: r.n for r in
             mixture_rebalance(d).groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert again == by_lang


def test_pack_sharded_invariants_and_partition_independence(spark):
    """Sharded packing: same invariants as pack_sequences PLUS layout
    independence from Spark partitioning — the property that makes it
    oracle-checkable (x66) and run-reproducible."""
    from kafana_spark.operators.pack import pack_sequences_sharded

    budget = 64
    d = docs(spark)
    out = pack_sequences_sharded(d, budget=budget, n_shards=4).collect()
    assert sorted(r.doc_id for r in out) == sorted(
        r.doc_id for r in d.select("doc_id").collect())
    seqs = {}
    for r in out:
        seqs.setdefault(r.seq_id, []).append(r)
    for sid, rows in seqs.items():
        total = sum(r.n_tokens for r in rows)
        assert all(r.seq_tokens == total and r.seq_docs == len(rows)
                   for r in rows)
        assert total <= budget or len(rows) == 1
    # identical layout regardless of input partitioning
    redist = pack_sequences_sharded(d.repartition(13), budget=budget,
                                    n_shards=4).collect()
    key = lambda rows: sorted(map(tuple, rows))
    assert key(redist) == key(out)


def test_weighted_sample_matches_reference(spark):
    """A-ES keys vs a plain-Python replay: same winners, same order,
    and zero-weight rows excluded."""
    import hashlib
    import math

    from kafana_spark.operators.sample import (
        WS_KEY_SCALE, WS_U_GRAIN, weighted_sample,
    )

    rows = [(i, (i * 37) % 50) for i in range(1, 40)]   # some weight 0
    df = spark.createDataFrame(rows, ["doc_id", "quality_bp"])
    got = [(r.doc_id, r.skey) for r in
           weighted_sample(df, "quality_bp", 10).collect()]

    def skey(i, w):
        h = int(hashlib.md5(f"{i}#ws".encode()).hexdigest()[:15], 16)
        u = ((h % WS_U_GRAIN) + 0.5) / WS_U_GRAIN
        return round(math.log(u) / w * WS_KEY_SCALE)

    ref = sorted(((i, skey(i, w)) for i, w in rows if w > 0),
                 key=lambda t: (-t[1], t[0]))[:10]
    assert got == ref


def test_weighted_sample_prefers_heavy_rows(spark):
    """Statistical sanity: with weights 1 vs 100, the heavy half must
    dominate the sample (A-ES inclusion tracks weight)."""
    from kafana_spark.operators.sample import weighted_sample

    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(1, 401)]
    df = spark.createDataFrame(rows, ["doc_id", "quality_bp"])
    picked = [r.doc_id for r in
              weighted_sample(df, "quality_bp", 50).collect()]
    heavy = sum(1 for i in picked if i % 2 == 0)
    assert heavy >= 40          # ~96% expected; 40 is a loose floor


# ------------------------------------------------------------------ DSIR

def test_dsir_prefers_target_like_documents(spark):
    from kafana_spark.operators.sample import dsir_weights

    d = docs(spark)
    out = dsir_weights(d, F.col("lang") == "en")
    ranked = [r.doc_id for r in
              out.orderBy(F.col("weight_u").desc(), "doc_id").collect()]
    langs = {r.doc_id: r.lang for r in d.select("doc_id", "lang").collect()}
    n = len(ranked)
    top_en = sum(langs[i] == "en" for i in ranked[: n // 4])
    bot_en = sum(langs[i] == "en" for i in ranked[-(n // 4):])
    assert top_en > bot_en  # target-like docs float to the top


def test_dsir_closed_form_tiny(spark):
    import math

    from kafana_spark.operators.sample import (
        DSIR_BUCKETS, DSIR_FP, dsir_weights)
    from kafana_spark.functions import portable_hash64  # noqa: F401

    rows = [(1, "a b", "en"), (2, "a c", "de"), (3, "b b", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: (r.n_feats, r.weight_u)
           for r in dsir_weights(df, F.col("lang") == "en").collect()}

    # replay: features = unigrams + bigrams, hashed md5-60bit % B
    import hashlib

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % DSIR_BUCKETS

    feats = {i: [h(g) for g in t.split(" ")
                 + [" ".join(p) for p in zip(t.split(" "), t.split(" ")[1:])]]
             for i, t, _ in rows}
    c_raw, c_t = {}, {}
    for i, t, lang in rows:
        for b in feats[i]:
            c_raw[b] = c_raw.get(b, 0) + 1
            if lang == "en":
                c_t[b] = c_t.get(b, 0) + 1
    n_raw, n_t = sum(c_raw.values()), sum(c_t.values())
    lr = {b: int(round((math.log(c_t.get(b, 0) + 1)
                        - math.log(n_t + DSIR_BUCKETS)
                        - math.log(c + 1)
                        + math.log(n_raw + DSIR_BUCKETS)) * DSIR_FP))
          for b, c in c_raw.items()}
    exp = {i: (len(feats[i]), sum(lr[b] for b in feats[i]))
           for i, _, _ in rows}
    assert out == exp


# ---------------------------------------------------------- token budget

def test_token_budget_matches_global_greedy(spark):
    from kafana_spark.operators import text as TT
    from kafana_spark.operators.sample import token_budget_select

    d = docs(spark)
    q = (TT.quality_score(d).select("doc_id", "quality_bp")
         .join(TT.token_count(d).select("doc_id", "n_tokens"), "doc_id"))
    rows = sorted(q.collect(), key=lambda r: (-r.quality_bp, r.doc_id))
    budget = 2000
    # prefix semantics: the running total covers every walked doc, so
    # the first overflow ends the selection (no skip-and-continue)
    exp, cum = [], 0
    for r in rows:
        cum += r.n_tokens
        if cum > budget:
            break
        exp.append((r.doc_id, cum))
    got = [(r.doc_id, r.cum_tokens) for r in
           token_budget_select(q, budget)
           .orderBy("cum_tokens").collect()]
    assert got == exp
    assert 0 < len(got) < q.count()  # the budget actually binds


def test_token_budget_no_single_partition_window(spark):
    """The corpus-side window must partition by score — the global
    running sum lives only on the tiny per-score aggregate."""
    from kafana_spark.operators import text as TT
    from kafana_spark.operators.sample import token_budget_select

    d = docs(spark)
    q = (TT.quality_score(d).select("doc_id", "quality_bp")
         .join(TT.token_count(d).select("doc_id", "n_tokens"), "doc_id"))
    import re

    plan = (token_budget_select(q, 2000)
            ._jdf.queryExecution().executedPlan().toString())
    # the corpus-side running sum (over n_tokens) partitions by score
    assert re.search(r"Window \[sum\(n_tokens[^\n]*\], \[quality_bp#\d+L?\]",
                     plan), plan
    # exactly one single-partition exchange: the per-score aggregate
    # (bounded by the score domain), never the corpus side
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert re.search(r"Exchange SinglePartition[^\n]*\n[^\n]*HashAggregate",
                     plan), plan


def test_mixture_waterfill_redistributes_capped_excess(spark):
    from kafana_spark.operators.sample import mixture_waterfill

    def doc(i, n, src):
        return (i, " ".join(["w"] * n), src)

    df = spark.createDataFrame(
        [doc(0, 100, "a"), doc(1, 100, "b"), doc(2, 10, "c")],
        ["doc_id", "text", "source"])
    out = {r.source: r for r in mixture_waterfill(
        df, budget_num=2, budget_den=1, cap_bp=20000,
        n_rounds=3).collect()}
    # budget 420, equal share 140; c caps at 20 in round 1; the 120
    # excess goes 60/60 to a and b, capping both at 200 in round 2
    assert out["c"].alloc_tokens == 20
    assert out["a"].alloc_tokens == 200
    assert out["b"].alloc_tokens == 200
    assert out["a"].epochs_bp == 20000
    assert sum(r.alloc_tokens for r in out.values()) == 420


def test_mixture_waterfill_uncapped_leaves_residue(spark):
    from kafana_spark.operators.sample import mixture_waterfill

    df = spark.createDataFrame(
        [(0, " ".join(["w"] * 100), "a"),
         (1, " ".join(["w"] * 100), "b")],
        ["doc_id", "text", "source"])
    out = {r.source: r for r in mixture_waterfill(
        df, budget_num=1, budget_den=1, cap_bp=20000,
        n_rounds=3).collect()}
    # budget 200, share 100 each, caps 200 never bind
    assert out["a"].alloc_tokens == 100
    assert out["b"].alloc_tokens == 100
    assert out["a"].epochs_bp == 10000
