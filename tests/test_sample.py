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
