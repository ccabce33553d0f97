"""Relevance family: BM25, more-like-this, highlight, percolate,
term suggester — plus the SymSpell coverage property the x92 oracle
equivalence rests on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafana_spark.operators import relevance as R
from kafana_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def tiny(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------------ BM25

def _bm25_expected(corpus, terms, k1=R.BM25_K1, b=R.BM25_B):
    """Plain-Python BM25 with the same fixed-point discipline."""
    n = len(corpus)
    dls = {i: len(t.split(" ")) for i, t in corpus}
    avgdl = sum(dls.values()) / n
    tf = {}
    for i, t in corpus:
        for w in t.split(" "):
            if w in terms:
                tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (_, w) in tf:
        df[w] = df.get(w, 0) + 1
    out = {}
    for (i, w), f_ in tf.items():
        idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
        c = idf * (f_ * (k1 + 1.0)) / (f_ + k1 * ((1.0 - b)
                                                  + b * dls[i] / avgdl))
        cu = int(round(c * R.BM25_FP))
        nm, s = out.get(i, (0, 0))
        out[i] = (nm + 1, s + cu)
    return out


def test_bm25_matches_reference_formula(spark):
    corpus = [(1, "a b a c"), (2, "b b b d"), (3, "a a a a a a"),
              (4, "c d e f g h i j")]
    exp = _bm25_expected(corpus, {"a", "b"})
    got = {r.doc_id: (r.n_matched, r.score_u)
           for r in R.bm25_topk(tiny(spark, corpus), ["a", "b"], 10)
           .collect()}
    assert got == exp


def test_bm25_rare_term_outranks_common(spark):
    # 'dup' appears in ~5% of docs — a doc matching it should outrank
    # any doc matching only the common terms.
    top = R.bm25_topk(docs(spark), ["dup", "merge"], 50).collect()
    with_dup = [r for r in top
                if r.n_matched == 2 or r.score_u > 2 * R.BM25_FP]
    assert top[0].score_u >= top[-1].score_u
    assert with_dup, "rare-term docs should reach the top block"


def test_bm25_topk_is_take_ordered(spark):
    plan = (R.bm25_topk(docs(spark), ["dup"], 5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------- more_like_this

def test_more_like_this_excludes_seed_and_ranks(spark):
    d = docs(spark)
    seed = d.orderBy("doc_id").first()["doc_id"]
    out = R.more_like_this(d, seed, 10).collect()
    assert len(out) == 10
    assert seed not in {r.doc_id for r in out}
    scores = [r.score_u for r in out]
    assert scores == sorted(scores, reverse=True)


# -------------------------------------------------------------- highlight

def test_highlight_positions_and_tags(spark):
    d = tiny(spark, [(1, "x y needle z"), (2, "no match here"),
                     (3, "needle starts")])
    out = {r.doc_id: r for r in R.highlight(d, "needle").collect()}
    assert set(out) == {1, 3}
    # padded text ' x y needle z ': ' needle ' at position 5
    assert out[1].pos == 5
    assert "<em>needle</em>" in out[1].snippet
    assert out[3].pos == 1
    # context window is honored
    assert len(out[1].snippet) <= 2 * R.HIGHLIGHT_CTX + len("needle") + 2


def test_highlight_adjacent_occurrence_tags_first_only(spark):
    d = tiny(spark, [(1, "a needle needle b")])
    (row,) = R.highlight(d, "needle").collect()
    assert row.snippet.count("<em>") == 1  # shared separator consumed


# -------------------------------------------------------------- percolate

def test_percolate_conjunctive_and_zero_hit(spark):
    d = tiny(spark, [(1, "a b c"), (2, "a c"), (3, "b c d")])
    out = {r.query_id: (r.n_hits, r.first_id)
           for r in R.percolate(d, {
               "q_ab": ["a", "b"], "q_c": ["c"], "q_none": ["zz"],
           }).collect()}
    assert out == {"q_ab": (1, 1), "q_c": (3, 1), "q_none": (0, None)}


def test_percolate_duplicate_tokens_count_once(spark):
    d = tiny(spark, [(1, "a a a")])  # 'a' thrice still matches ['a'] once
    out = {r.query_id: r.n_hits
           for r in R.percolate(d, {"q": ["a"]}).collect()}
    assert out == {"q": 1}


def test_percolate_broadcasts_query_side(spark):
    plan = (R.percolate(docs(spark), {"q": ["dup"]})
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


# ----------------------------------------------------------- term_suggest

def test_deletion_variants_cover_lev2_on_real_vocab(spark):
    """The oracle-equivalence keystone: SymSpell ≤2-deletion
    neighborhoods intersect for EVERY (query, vocab) pair within
    Levenshtein distance 2 — checked exhaustively on the real corpus
    vocabulary × the registry's misspelled inputs."""
    from kafana_spark.operators.registry import SUGGEST_INPUTS

    vocab = [r.term for r in docs(spark)
             .select(F.explode(F.split("text", " ")).alias("term"))
             .distinct().collect()]

    def dels(w, d):
        out = {w}
        frontier = {w}
        for _ in range(d):
            frontier = {v[:i] + v[i + 1:]
                        for v in frontier for i in range(len(v))}
            out |= frontier
        return out

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for q in SUGGEST_INPUTS:
        qd = dels(q, R.SUGGEST_MAX_EDIT)
        for v in vocab:
            if lev(q, v) <= R.SUGGEST_MAX_EDIT:
                assert qd & dels(v, R.SUGGEST_MAX_EDIT), (q, v)


def test_term_suggest_matches_brute_force(spark):
    from kafana_spark.operators.registry import SUGGEST_INPUTS

    d = docs(spark)
    got = [(r.q, r.term, r.dist) for r in
           R.term_suggest(d, list(SUGGEST_INPUTS)).collect()]
    # brute force over collected vocab with identical ranking
    freq = {r.term: r.cnt for r in
            d.select(F.explode(F.split("text", " ")).alias("term"))
            .groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
            .collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    exp = []
    for q in sorted(SUGGEST_INPUTS):
        cands = sorted(
            ((lev(q, t), -c, t) for t, c in freq.items()
             if lev(q, t) <= R.SUGGEST_MAX_EDIT))
        exp += [(q, t, dv) for dv, _, t in cands[:R.SUGGEST_PER_TERM]]
    assert [(q, t, dv) for q, t, dv in got] == exp


def test_term_suggest_no_suggestion_for_far_word(spark):
    out = R.term_suggest(docs(spark), ["xyzzy"]).collect()
    assert out == []


def test_msearch_matches_single_search_bm25(spark):
    """Each _msearch slice must equal the standalone x88 ranking for
    the same terms — one scan, zero semantic drift."""
    from kafana_spark.operators.relevance import bm25_topk, msearch_bm25

    rows = [(i, t) for i, t in enumerate([
        "spark sort spark", "merge sort", "spark merge merge",
        "window scan", "sort sort window", "scan scan"])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    searches = {"a": ("spark",), "b": ("merge", "sort")}
    out = msearch_bm25(df, searches, k=3).collect()
    for sid, terms in searches.items():
        want = [(r.doc_id, r.n_matched, r.score_u)
                for r in bm25_topk(df, terms, k=3).collect()]
        got = [(r.doc_id, r.n_matched, r.score_u)
               for r in out if r.sid == sid]
        assert got == want, sid
    # ranks are 1-based consecutive per sid
    assert [r.rank for r in out if r.sid == "a"] == [1, 2]
