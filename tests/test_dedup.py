"""Dedup operator tests (exact, MinHash/LSH, SimHash, embedding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafana_spark.operators import dedup
from kafana_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_exact_dedup_keeps_min_id_per_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z"), (4, "a b c")],
        ["doc_id", "text"])
    kept = sorted(r.doc_id for r in dedup.exact_dedup(df).collect())
    assert kept == [1, 3]


def test_minhash_matches_exact_ngram_jaccard(spark):
    """LSH banding (16 bands × 2 rows) should recall every planted
    near-dup pair that exact shingle-Jaccard finds at J ≥ 0.5."""
    mh = {(r.da, r.db): r.jaccard
          for r in dedup.minhash_near_dup(docs(spark), 0.5).collect()}
    ex = {(r.da, r.db): r.jaccard
          for r in dedup.ngram_jaccard_dup(docs(spark), 0.5).collect()}
    assert mh == ex
    assert len(ex) > 0


def test_minhash_signature_shape(spark):
    sh = dedup.shingle_set(docs(spark).limit(10))
    sig = dedup.minhash_signature(sh)
    assert len(sig.columns) == 1 + dedup.MINHASH_K
    row = sig.collect()[0]
    assert all(0 <= row[f"mh{i}"] < dedup.MINHASH_P
               for i in range(dedup.MINHASH_K))


def test_simhash_is_deterministic_and_bounded(spark):
    a = {r.doc_id: r.simhash for r in dedup.simhash(docs(spark)).collect()}
    b = {r.doc_id: r.simhash for r in dedup.simhash(docs(spark)).collect()}
    assert a == b
    assert all(0 <= v < 2 ** dedup.SIMHASH_BITS for v in a.values())


def test_simhash_near_dup_overlaps_jaccard_dups(spark):
    """Hamming-close simhash pairs should largely be the high-Jaccard
    pairs (different sketch, same planted duplicates)."""
    sim = {(r.da, r.db) for r in dedup.simhash_near_dup(docs(spark)).collect()}
    jac = {(r.da, r.db)
           for r in dedup.ngram_jaccard_dup(docs(spark), 0.5).collect()}
    assert sim, "no simhash near-dups found"
    assert len(sim & jac) / len(sim) >= 0.7


def test_embedding_near_dup_symmetric_threshold(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    pairs = dedup.embedding_near_dup(e, threshold=0.45).collect()
    assert all(r.cos >= 0.45 and r.da < r.db for r in pairs)


def test_embedding_near_dup_probe_sampling(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    full = {(r.da, r.db) for r in
            dedup.embedding_near_dup(e, threshold=0.45).collect()}
    sampled = {(r.da, r.db) for r in
               dedup.embedding_near_dup(e, threshold=0.45, probe_mod=10).collect()}
    assert sampled == {p for p in full if p[0] % 10 == 0}
