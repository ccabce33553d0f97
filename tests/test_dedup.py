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


def test_minhash_collapse_exact_is_output_identical(spark):
    """collapse_exact=True must produce exactly the uncollapsed pairs on
    a corpus mixing exact copies, near-dups, and shingle-less shorts."""
    base = docs(spark).limit(60).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(9001, "tiny"), (9002, "tiny"),          # shingle-less twins
         (9003, "one two three four five six seven eight nine ten"),
         (9004, "one two three four five six seven eight nine ten"),
         (9005, "one two three four five six seven eight nine eleven")],
        ["doc_id", "text"])
    corpus = base.unionByName(extra).unionByName(
        base.limit(10).select((F.col("doc_id") + 5000).alias("doc_id"),
                              "text"))
    on = {(r.da, r.db, r.jaccard) for r in
          dedup.minhash_near_dup(corpus, 0.5, collapse_exact=True).collect()}
    off = {(r.da, r.db, r.jaccard) for r in
           dedup.minhash_near_dup(corpus, 0.5, collapse_exact=False).collect()}
    assert on == off and len(on) > 0


def test_minhash_duplicate_heavy_corpus_bounded(spark):
    """A 400-copy text: with collapse_exact the LSH middle sees ONE
    representative (no quadratic bucket), and the expanded output is
    exactly the C(400,2) copy pairs plus nothing else."""
    n = 400
    rows = [(i, "the same exact document body repeated many times over")
            for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    reps = df.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    assert reps.count() == 1
    out = dedup.minhash_near_dup(df, 0.5).collect()
    assert len(out) == n * (n - 1) // 2
    assert all(r.jaccard == 1.0 and r.da < r.db for r in out)


def test_candidate_pairs_bucket_cap_drops_only_fat_buckets(spark):
    bands = spark.createDataFrame(
        [(i, 0, "hot") for i in range(10)] + [(100, 0, "cold"), (101, 0, "cold")],
        ["doc_id", "band", "bkey"])
    capped = dedup.candidate_pairs(bands, bucket_cap=5).collect()
    assert {(r.da, r.db) for r in capped} == {(100, 101)}
    full = dedup.candidate_pairs(bands).collect()
    assert len(full) == 45 + 1


def test_dup_clusters_transitive_and_singletons(spark):
    """Chain a~b, b~c (a never directly pairs c) must collapse into one
    cluster labeled min(id); isolated docs keep their own id."""
    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    t2 = "alpha beta gamma delta epsilon zeta eta iota"      # ~ t1
    t3 = "alpha beta gamma delta epsilon zeta kappa iota"    # ~ t2, far from t1? still shares 5-grams with t1
    df = spark.createDataFrame(
        [(10, t1), (20, t2), (30, t3),
         (40, "completely different words here nothing shared at all")],
        ["doc_id", "text"])
    pairs = {(r.da, r.db) for r in
             dedup.minhash_near_dup(df, 0.5).select("da", "db").collect()}
    labels = {r.doc_id: r.cluster_id for r in
              dedup.dup_clusters(df, 0.5).collect()}
    assert labels[40] == 40
    # every pair is intra-cluster, and the component label is its min
    for a, b in pairs:
        assert labels[a] == labels[b]
    if pairs:
        comp = {10, 20, 30} & {x for p in pairs for x in p}
        assert all(labels[x] == min(comp) for x in comp)
    assert len(labels) == 4


def test_dup_clusters_distributed_path_matches_driver_path(spark):
    """Forcing the iterative label-propagation path (threshold 0) must
    produce exactly the driver union-find labels."""
    d = (load_table(spark, SF_SMOKE, "documents").limit(120)
         .select("doc_id", "text"))
    a = {r.doc_id: r.cluster_id for r in dedup.dup_clusters(d).collect()}
    b = {r.doc_id: r.cluster_id for r in
         dedup.dup_clusters(d, driver_cc_max_edges=0).collect()}
    assert a == b and len(a) == 120


def test_benchmark_overlap_flags_exact_and_not_unrelated(spark):
    from kafana_spark.operators.dedup import benchmark_overlap

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # shares 2 3-grams w/ 1
        (3, "one two three four five"),          # disjoint
    ]
    corpus = spark.createDataFrame(rows[1:], "doc_id long, text string")
    bench = spark.createDataFrame(rows[:1], "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in benchmark_overlap(corpus, bench).collect()}
    assert got[2] == (2, True)       # 'alpha beta gamma', 'beta gamma delta'
    assert got[3] == (0, False)
    # every corpus doc is reported, contaminated or not
    assert set(got) == {2, 3}


def test_incremental_near_dup_is_cross_side_slice_of_full(spark):
    """incremental(new, old) == full-pipeline pairs with exactly one
    endpoint in each side (and never a within-side pair)."""
    from kafana_spark.operators.dedup import (
        incremental_near_dup,
        minhash_near_dup,
    )

    d = docs(spark)
    new = d.where(F.col("doc_id") % 2 == 1)
    old = d.where(F.col("doc_id") % 2 == 0)
    inc = {(r.da, r.db) for r in incremental_near_dup(new, old, 0.3)
           .collect()}
    full = {(r.da, r.db) for r in
            minhash_near_dup(d, 0.3, collapse_exact=False).collect()}
    cross = {(a, b) for a, b in full if (a % 2) != (b % 2)}
    assert inc == cross
    assert all((a % 2) != (b % 2) for a, b in inc)


# ---------------------------------------------- bucketed embedding dedup

def test_embedding_near_dup_bucketed_subset_and_recall(spark):
    """x68 contract: bucketing can only DROP pairs (every reported pair
    is a true above-threshold pair), and with n_assign=4 the measured
    recall vs the exhaustive kernel stays high (1.0 at this sf)."""
    e = load_table(spark, SF_SMOKE, "embeddings")
    full = {(r.da, r.db) for r in
            dedup.embedding_near_dup(e, 0.45).collect()}
    buck = {(r.da, r.db) for r in
            dedup.embedding_near_dup_bucketed(
                e, 0.45, centroid_mod=40, n_assign=4).collect()}
    assert full, "fixture lost its planted embedding dups"
    assert buck <= full
    assert len(buck & full) / len(full) >= 0.9


# ------------------------------------------------- exact-substring dedup

def test_positional_gram_index_is_window_not_hof(spark):
    """Plan pin (r12 substr-ladder finding): the gram assembly must
    be the codegen'd lead-window shape, never an array-transform —
    Catalyst higher-order functions evaluate INTERPRETED and re-ran
    the token split per gram position (O(len²) per doc; 15+ min on
    the 50k-doc sf1p serve leg vs seconds for the window shape).
    Also pins short-doc semantics: docs under k tokens yield no
    grams."""
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "too short")], ["doc_id", "text"])
    g = dedup.positional_gram_index(df, k=5)
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan
    assert "transform(" not in plan, plan
    rows = g.collect()
    assert sorted(r.pos for r in rows if r.doc_id == 1) == [0, 1]
    assert not [r for r in rows if r.doc_id == 2]


def test_exact_substr_spans_planted_cross_doc(spark):
    dup = "alpha beta gamma delta epsilon"   # one 5-token gram (k=5)
    df = spark.createDataFrame(
        [(1, f"one two {dup} three four"),
         (2, f"x y z {dup} w"),
         (3, "totally unique tokens with nothing shared at all")],
        ["doc_id", "text"])
    spans = {r.doc_id: (r.start_tok, r.end_tok, r.span_tokens)
             for r in dedup.exact_substr_spans(df, k=5).collect()}
    assert spans[1] == (2, 6, 5)
    assert spans[2] == (3, 7, 5)
    assert 3 not in spans


def test_exact_substr_spans_merge_overlapping_grams(spark):
    """Six shared tokens = two overlapping 5-grams → ONE maximal span
    of 6 tokens per doc, not two rows."""
    dup = "a b c d e f"
    df = spark.createDataFrame(
        [(1, f"p q {dup}"), (2, f"{dup} r s")], ["doc_id", "text"])
    got = dedup.exact_substr_spans(df, k=5).collect()
    assert len(got) == 2
    by_doc = {r.doc_id: r for r in got}
    assert by_doc[1].span_tokens == 6 and by_doc[1].start_tok == 2
    assert by_doc[2].span_tokens == 6 and by_doc[2].start_tok == 0


def test_exact_substr_spans_within_doc_repeat(spark):
    """A gram repeated WITHIN one document is a duplicated span too
    (ExactSubstr counts total occurrences, not distinct docs)."""
    dup = "r s t u v"
    df = spark.createDataFrame(
        [(1, f"{dup} filler1 filler2 {dup}"),
         (2, "nothing shared here at all zz")], ["doc_id", "text"])
    got = dedup.exact_substr_spans(df, k=5).collect()
    assert {r.doc_id for r in got} == {1}
    assert len(got) == 2                      # two disjoint spans
    assert sorted((r.start_tok, r.end_tok) for r in got) == \
        [(0, 4), (7, 11)]


def test_exact_substr_strip_token_accounting(spark):
    """strip removes EXACTLY the covered positions: surviving token
    count = original - sum(span_tokens), per document."""
    d = docs(spark).limit(200)
    cut = {r.doc_id: r.cut for r in
           dedup.exact_substr_spans(d).groupBy("doc_id")
           .agg(F.sum("span_tokens").alias("cut")).collect()}
    orig = {r.doc_id: r.n for r in
            d.select("doc_id",
                     F.size(F.split("text", " ")).alias("n")).collect()}
    got = {r.doc_id: len(r.text.split())
           for r in dedup.exact_substr_strip(d).collect()}
    assert set(got) == set(orig)              # every doc survives (maybe empty)
    for did, n in orig.items():
        assert got[did] == n - cut.get(did, 0)


def test_exact_substr_finds_spans_in_fixture(spark):
    """The planted near-dups share long runs — the fixture must
    actually exercise the operator."""
    assert dedup.exact_substr_spans(docs(spark)).count() > 0


# ------------------------------------------------------- cc driver gate

def test_derived_cc_gate_bounds(spark):
    g = dedup._derived_cc_gate(spark)
    assert 100_000 <= g <= 5_000_000


def test_embedding_dup_clusters_pairs_share_cluster_keep_one(spark):
    """x73 consistency: every x68 pair lands in one cluster, every
    cluster keeps exactly its min vec_id, and non-dup vectors are
    their own kept singleton."""
    e = load_table(spark, SF_SMOKE, "embeddings")
    pairs = dedup.embedding_near_dup_bucketed(
        e, 0.45, centroid_mod=40, n_assign=4).collect()
    rows = dedup.embedding_dup_clusters(
        e, 0.45, centroid_mod=40, n_assign=4).collect()
    cl = {r.vec_id: r.cluster_id for r in rows}
    keep = {r.vec_id: r.keep for r in rows}
    assert len(cl) == e.count()
    for p in pairs:
        assert cl[p.da] == cl[p.db]
    by_cluster: dict[int, list[int]] = {}
    for v, c in cl.items():
        by_cluster.setdefault(c, []).append(v)
    for c, members in by_cluster.items():
        assert c == min(members)            # label is the component min
        kept = [v for v in members if keep[v]]
        assert kept == [min(members)]       # exactly one keeper, the min


def test_benchmark_contamination_spans_planted(spark):
    """A corpus doc holding a verbatim benchmark run must report
    exactly that span; clean docs report nothing."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "intro words quick brown fox closing remark"),
         (2, "completely unrelated clean document content")],
        ["doc_id", "text"])
    got = dedup.benchmark_contamination_spans(corpus, bench, k=3).collect()
    assert {r.doc_id for r in got} == {1}
    (span,) = got
    # "quick brown fox" = tokens 2..4 of doc 1
    assert (span.start_tok, span.end_tok, span.span_tokens) == (2, 4, 3)


def test_snm_pairs_are_true_near_dups(spark):
    """Every SNM-verified pair must be a genuine above-threshold
    Jaccard pair (blocking can only DROP pairs, never invent them),
    and the fixture must actually exercise the path."""
    snm = {(r.da, r.db): r.jaccard for r in
           dedup.sorted_neighborhood_dup(docs(spark), 0.5).collect()}
    full = {(r.da, r.db): r.jaccard for r in
            dedup.ngram_jaccard_dup(docs(spark), 0.5).collect()}
    assert snm, "SNM found nothing — fixture lost its prefix dups"
    assert set(snm) <= set(full)
    assert all(snm[p] == full[p] for p in snm)


def test_minhash_hash_fn_knob_parity(spark):
    """The r10 hash_fn knob: xxhash64 (production) must reproduce the
    md5 (oracle-contract) near-dup output on the fixture corpus — the
    exact-Jaccard verify is hash-set-intersection based, so values are
    identical for any pair both settings surface, and band recall at
    these thresholds is stable across hash functions. Oracles stay
    md5; this pins that the opt-in path is the same operator, not a
    different approximation."""
    d = docs(spark)
    md5_out = {(r.da, r.db): r.jaccard for r in
               dedup.minhash_near_dup(d, threshold=0.5).collect()}
    xx_out = {(r.da, r.db): r.jaccard for r in
              dedup.minhash_near_dup(d, threshold=0.5,
                                     hash_fn="xxhash64").collect()}
    assert md5_out == xx_out
    assert md5_out, "fixture must produce near-dup pairs"


def test_hash_fn_knob_parity_ngram_overlap_snm_chunk(spark):
    """r11: the hash_fn knob extended to the remaining shingle
    consumers the r10 verdict named — x03 ngram-Jaccard, x249 overlap
    coefficient, x79 SNM verify, x45 chunk dedup. All four compute
    hash-VALUE-independent outputs (set intersections / frequency
    counts), so xxhash64 must reproduce the md5 rows exactly; oracles
    stay md5."""
    from kafana_spark.operators import text as text_ops

    d = docs(spark)

    ng_md5 = {(r.da, r.db): r.jaccard for r in
              dedup.ngram_jaccard_dup(d, 0.5).collect()}
    ng_xx = {(r.da, r.db): r.jaccard for r in
             dedup.ngram_jaccard_dup(d, 0.5,
                                     hash_fn="xxhash64").collect()}
    assert ng_md5 == ng_xx and ng_md5

    ov_md5 = {(r.da, r.db): r.overlap_bp for r in
              dedup.overlap_near_dup(d, 5000).collect()}
    ov_xx = {(r.da, r.db): r.overlap_bp for r in
             dedup.overlap_near_dup(d, 5000,
                                    hash_fn="xxhash64").collect()}
    assert ov_md5 == ov_xx and ov_md5

    snm_md5 = {(r.da, r.db): r.jaccard for r in
               dedup.sorted_neighborhood_dup(d, 0.5).collect()}
    snm_xx = {(r.da, r.db): r.jaccard for r in
              dedup.sorted_neighborhood_dup(
                  d, 0.5, hash_fn="xxhash64").collect()}
    assert snm_md5 == snm_xx and snm_md5

    cd = spark.createDataFrame(
        [(1, "hdr hdr hdr unique one text"),
         (2, "hdr hdr hdr unique two words"),
         (3, "hdr hdr hdr unique three here")],
        ["doc_id", "text"])
    ck_md5 = {r.doc_id: r.clean_text for r in
              text_ops.chunk_dedup(cd, block_tokens=3,
                                   max_freq=2).collect()}
    ck_xx = {r.doc_id: r.clean_text for r in
             text_ops.chunk_dedup(cd, block_tokens=3, max_freq=2,
                                  hash_fn="xxhash64").collect()}
    assert ck_md5 == ck_xx and ck_md5

    new = d.where("doc_id % 7 = 0")
    old = d.where("doc_id % 7 != 0")
    inc_md5 = {(r.da, r.db): r.jaccard for r in
               dedup.incremental_near_dup(new, old, 0.5).collect()}
    inc_xx = {(r.da, r.db): r.jaccard for r in
              dedup.incremental_near_dup(
                  new, old, 0.5, hash_fn="xxhash64").collect()}
    assert inc_md5 == inc_xx and inc_md5

    bo_md5 = {r.doc_id: (r.n_hits, r.contaminated) for r in
              dedup.benchmark_overlap(old, new).collect()}
    bo_xx = {r.doc_id: (r.n_hits, r.contaminated) for r in
             dedup.benchmark_overlap(
                 old, new, hash_fn="xxhash64").collect()}
    assert bo_md5 == bo_xx
    assert any(v[1] for v in bo_md5.values()), \
        "fixture must contain contaminated docs"


def test_minhash_pipeline_pair_first_parity(spark):
    """The pair_first knob threaded through the full pipeline (r11):
    minhash_near_dup(pair_first=True) must equal the default on the
    fixture, through the collapse_exact expansion."""
    d = docs(spark)
    base = {(r.da, r.db): r.jaccard for r in
            dedup.minhash_near_dup(d, 0.5).collect()}
    pf = {(r.da, r.db): r.jaccard for r in
          dedup.minhash_near_dup(d, 0.5, pair_first=True).collect()}
    assert base == pf and base


def test_jaccard_verify_pair_first_parity(spark):
    """r11: the pair-first verify shape (the low-entropy-regime
    escape hatch — join volume bounded by the candidate list instead
    of Σ df²) must produce EXACTLY the default self-join shape's
    rows. Run on the full minhash front end so real LSH candidates,
    not synthetic pairs, exercise it."""
    d = docs(spark)
    sh = dedup.hashed_shingle_set(d)
    pairs = dedup.candidate_pairs(
        dedup.lsh_bands(dedup.minhash_signature(sh)))
    default = {(r.da, r.db): r.jaccard for r in
               dedup.jaccard_verify(pairs, sh, 0.5).collect()}
    pf = {(r.da, r.db): r.jaccard for r in
          dedup.jaccard_verify(pairs, sh, 0.5,
                               pair_first=True).collect()}
    assert default == pf and default


def test_jaccard_verify_auto_parity_and_default_at_natural_entropy(
        spark):
    """r12: pair_first="auto" estimates both join volumes from the
    pruned index and picks a shape; on the natural-entropy fixture
    the estimates are the same order, so auto must (a) produce the
    exact default rows and (b) actually pick the default self-join
    shape (behavior unchanged where estimates are close)."""
    d = docs(spark)
    sh = dedup.hashed_shingle_set(d)
    pairs = dedup.candidate_pairs(
        dedup.lsh_bands(dedup.minhash_signature(sh)))
    default = {(r.da, r.db): r.jaccard for r in
               dedup.jaccard_verify(pairs, sh, 0.5).collect()}
    auto = {(r.da, r.db): r.jaccard for r in
            dedup.jaccard_verify(pairs, sh, 0.5,
                                 pair_first="auto").collect()}
    assert default == auto and default

    key = "h" if "h" in sh.columns else "s"
    from pyspark.sql import functions as F
    cand = (pairs.select(F.col("da").alias("doc_id"))
            .unionByName(pairs.select(F.col("db").alias("doc_id")))
            .distinct())
    sh_v = sh.join(cand, "doc_id", "left_semi")
    est_self, est_pf = dedup.verify_shape_estimates(pairs, sh_v, key)
    assert est_self <= max(dedup.AUTO_SHAPE_FLOOR,
                           dedup.AUTO_SHAPE_RATIO * est_pf), \
        (est_self, est_pf)


def test_shingle_hash64_rejects_unknown_fn():
    import pytest

    from kafana_spark.functions import shingle_hash64

    with pytest.raises(ValueError):
        shingle_hash64(F.lit("x"), "sha1")


def test_jaccard_verify_ckpt_knob_parity(spark):
    """The r12 serve boundaries (pairs / pruned-index checkpoints) are
    pure materialization: every knob combination computes identical
    rows."""
    d = docs(spark)
    sh = dedup.hashed_shingle_set(d)
    pairs = dedup.candidate_pairs(
        dedup.lsh_bands(dedup.minhash_signature(sh)))
    ref = None
    for cp in (False, True):
        for ci in (False, True):
            got = {(r.da, r.db): r.jaccard for r in
                   dedup.jaccard_verify(pairs, sh, 0.5, ckpt_pairs=cp,
                                        ckpt_index=ci).collect()}
            if ref is None:
                ref = got
            assert got == ref, (cp, ci)
    assert ref


def test_minhash_near_dup_ckpt_knob_passthrough_parity(spark):
    """minhash_near_dup's ckpt knobs (r12 — threaded through for the
    x124-style caller whose plan consumes the shingle pass in a second
    branch) are pure materialization: knobs-off equals the default on
    both collapse_exact branches."""
    d = docs(spark)
    for ce in (True, False):
        ref = {(r.da, r.db): r.jaccard for r in
               dedup.minhash_near_dup(d, 0.5, collapse_exact=ce)
               .collect()}
        off = {(r.da, r.db): r.jaccard for r in
               dedup.minhash_near_dup(d, 0.5, collapse_exact=ce,
                                      ckpt_pairs=False,
                                      ckpt_index=False).collect()}
        assert off == ref and ref, ce


def test_jaccard_verify_boundaries_do_not_leak_into_fresh_builds(spark):
    """The serve boundaries must be localCheckpoint-based, never
    ``persist()``: Spark's CacheManager matches CANONICALIZED plans, so
    a persisted subplan is silently substituted into the next identical
    build in the same session — a separately-constructed re-run of the
    same query would then read the first run's cache instead of
    computing from the inputs (measured r12; the banned cross-run
    caching). Pin: after running the full pipeline once, a fresh
    identical build's executed plan contains no InMemoryTableScan."""
    d = docs(spark)
    dedup.minhash_near_dup(d, 0.5).collect()
    fresh = dedup.minhash_near_dup(d, 0.5)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan


def test_lsh_eval_counts_matches_member_level_comparison(spark):
    """lsh_eval_counts (the r13 x124 shape: one collapse + one
    materialized shingle pass, rep-level comparison weighted by group
    counts) must produce the EXACT tp/fp/fn of the old formulation —
    full-outer-joining the member-level pair lists of
    minhash_near_dup and ngram_jaccard_dup over the raw corpus — on a
    corpus mixing exact-dup groups (sizes 2 and 3), near-dups across
    groups, shingle-less twins, and unique docs."""
    base = docs(spark).limit(60).select("doc_id", "text")
    extra = spark.createDataFrame(
        [(9001, "tiny"), (9002, "tiny"),          # shingle-less twins
         (9003, "one two three four five six seven eight nine ten"),
         (9004, "one two three four five six seven eight nine ten"),
         (9005, "one two three four five six seven eight nine ten"),
         (9006, "one two three four five six seven eight nine eleven"),
         (9007, "one two three four five six seven eight nine eleven")],
        ["doc_id", "text"])
    corpus = base.unionByName(extra).unionByName(
        base.limit(10).select((F.col("doc_id") + 5000).alias("doc_id"),
                              "text"))
    lsh = {(r.da, r.db) for r in
           dedup.minhash_near_dup(corpus, 0.5).collect()}
    ex = {(r.da, r.db) for r in
          dedup.ngram_jaccard_dup(corpus, 0.5).collect()}
    want = {"tp": len(lsh & ex), "fp": len(lsh - ex),
            "fn": len(ex - lsh)}
    assert want["tp"] > 0  # fixture must exercise the comparison
    got = dedup.lsh_eval_counts(corpus, 0.5).collect()[0].asDict()
    assert got == want, (got, want)


def test_jaccard_verify_index_fn_prune_equivalence(spark):
    """The r13 index_docs/index_fn prune (shingle only the candidate-
    pruned DOCS instead of semi-joining the full index) must produce
    exactly the rows of the index-semi-join shape — shingles of a doc
    subset are the subset of the index by construction."""
    d = docs(spark).select("doc_id", "text")
    sh = dedup.hashed_shingle_set(d)
    pairs = dedup.candidate_pairs(
        dedup.lsh_bands(dedup.minhash_signature(sh)))
    base = dedup.jaccard_verify(pairs, sh, 0.3)
    pruned = dedup.jaccard_verify(
        pairs, sh, 0.3,
        index_docs=d,
        index_fn=lambda x: dedup.hashed_shingle_set(x))
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, pruned.collect()))
    assert a and a == b
