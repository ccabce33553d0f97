"""Graph analytics over mutual k-NN edges (x212-x214) — closed-form
semantics on known graphs via the *_from_edges tails.

Pinned behaviors:
- pagerank: integer µunit walk — teleport = (10000-damp)*1e6 div 1e4,
  contributions pr div deg (truncating), unrolled rounds; vertices
  are mutual-edge members only; rank ties break on vec_id.
- triangles: wedge join over canonical a<b edges; global_cc =
  3*triangles/wedges in bp.
- degree histogram: per-degree vertex counts + shares.
"""

from __future__ import annotations

from kafana_spark.operators.similarity import (
    degree_histogram_from_edges,
    pagerank_from_edges,
    triangles_from_edges,
)


def edges(spark, pairs):
    return spark.createDataFrame(list(pairs), ["a", "b"])


def test_pagerank_star_center_ranks_first(spark):
    # star: 0 connected to 1..4 -> center holds highest rank
    mu = edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
    out = pagerank_from_edges(mu, iters=2, damp_bp=8500).collect()
    assert out[0].vec_id == 0 and out[0].rank == 1
    assert out[0].deg == 4
    leaves = [r for r in out if r.vec_id != 0]
    assert len(set(r.pr for r in leaves)) == 1
    # exact integer walk: leaves start at 1e6, center gets
    # 150000 + 8500*4*(1e6 div 4... ) -- verify round 1 by hand:
    # r1(center) = 150000 + 8500 * (4 * (1000000 div 1)) div 10000
    #            = 150000 + 3400000 = 3550000
    # r1(leaf)   = 150000 + 8500 * (1000000 div 4) div 10000 = 362500
    # r2(center) = 150000 + 8500 * (4 * 362500) div 10000 = 1382500
    assert out[0].pr == 1382500
    # r2(leaf) = 150000 + 8500 * (3550000 div 4) div 10000 = 904375
    assert leaves[0].pr == 904375


def test_pagerank_symmetric_pair_is_stationary(spark):
    # two vertices, one edge: pr stays 1e6-ish forever (deg 1 both)
    mu = edges(spark, [(1, 2)])
    out = pagerank_from_edges(mu, iters=3).collect()
    assert [r.pr for r in out] == [1000000, 1000000]
    assert [r.rank for r in out] == [1, 2]
    assert [r.vec_id for r in out] == [1, 2]  # tie -> vec_id order


def test_triangles_counts_closed_wedges_once(spark):
    # triangle 1-2-3 plus a pendant 3-4: one triangle,
    # wedges: deg(1)=2,deg(2)=2,deg(3)=3,deg(4)=1 -> 1+1+3+0 = 5
    mu = edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    r = triangles_from_edges(mu).collect()[0]
    assert (r.n_vertices, r.n_edges) == (4, 4)
    assert (r.n_wedges, r.n_triangles) == (5, 1)
    assert r.global_cc_bp == 3 * 1 * 10000 // 5


def test_triangles_none_in_tree(spark):
    mu = edges(spark, [(1, 2), (2, 3), (3, 4)])
    r = triangles_from_edges(mu).collect()[0]
    assert r.n_triangles == 0
    assert r.global_cc_bp == 0


def test_degree_histogram_shares(spark):
    # path 1-2-3: degrees 1,2,1
    mu = edges(spark, [(1, 2), (2, 3)])
    out = {r.deg: r for r in degree_histogram_from_edges(mu).collect()}
    assert out[1].n_vertices == 2 and out[2].n_vertices == 1
    assert out[1].share_bp == 6666 and out[2].share_bp == 3333


def test_ppr_seeds_hold_teleport_mass(spark):
    # path 0-1, 1-2: seed_mod huge -> only vertex 0 is a seed
    from kafana_spark.operators.similarity import ppr_from_edges

    mu = edges(spark, [(0, 1), (1, 2)])
    out = {r.vec_id: r for r in ppr_from_edges(
        mu, seed_mod=10 ** 9, iters=1).collect()}
    assert out[0].is_seed and not out[1].is_seed
    # round 1: v0 = tele + damp*(pr1 div deg1) = 150000 + 0 = 150000
    # v1 receives from v0: 1000000 div 1 -> 150000? no tele (not seed)
    # v1 = 0 + 8500 * 1000000 div 10000 = 850000
    assert out[0].pr == 150000
    assert out[1].pr == 850000
    assert out[2].pr == 0
    assert out[1].rank == 1     # the walked-in neighbour leads


def test_modularity_perfect_split_vs_merged(spark):
    from pyspark.sql import functions as F
    from kafana_spark.operators.similarity import (
        modularity_from_assignment,
    )

    # two disjoint triangles; assignment = the true components
    mu = edges(spark, [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)])
    asg = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20), (5, 20), (6, 20)],
        ["vec_id", "cid"])
    r = modularity_from_assignment(mu, asg).collect()[0]
    assert (r.n_cells, r.m_edges) == (2, 6)
    assert r.intra_bp == 10000
    # Q = 1 - 2*(6/12)^2 = 0.5 -> 5000 bp
    assert r.q_bp == 5000
    # everything in ONE cell: Q = 1 - 1 = 0
    one = asg.select("vec_id", F.lit(1).alias("cid"))
    assert modularity_from_assignment(mu, one).collect()[0].q_bp == 0


def test_modularity_anti_community_is_negative(spark):
    from kafana_spark.operators.similarity import (
        modularity_from_assignment,
    )

    # single edge, endpoints in DIFFERENT cells: e_c = 0,
    # Q = -( (1/2)^2 + (1/2)^2 ) = -0.5 -> -5000 bp
    mu = edges(spark, [(1, 2)])
    asg = spark.createDataFrame([(1, 10), (2, 20)], ["vec_id", "cid"])
    r = modularity_from_assignment(mu, asg).collect()[0]
    assert (r.intra_bp, r.q_bp) == (0, -5000)


def test_graph_walks_release_executor_cache(spark):
    """The *_from_edges tails persist edge/vertex frames for the walk;
    the cache must be GONE once the (bounded) result is handed back —
    repeated calls in one session must not accumulate storage."""
    from kafana_spark.operators.similarity import (
        link_prediction_from_edges,
        modularity_from_assignment,
        ppr_from_edges,
    )

    mu = edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    asg = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 20)], ["vec_id", "cid"])
    # other suites sharing this session may hold documented persists
    # (e.g. graph_explore's vocab frame) — assert no NEW entries
    before = {i.id() for i in
              spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    pagerank_from_edges(mu, iters=2).collect()
    ppr_from_edges(mu, seed_mod=10 ** 9, iters=1).collect()
    triangles_from_edges(mu).collect()
    modularity_from_assignment(mu, asg).collect()
    link_prediction_from_edges(mu).collect()
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    leaked = [str(i) for i in infos if i.id() not in before]
    assert not leaked, leaked


def test_walk_tails_driver_branch_equals_distributed(spark):
    """r12 hybrid driver gate: every *_from_edges tail computes the
    IDENTICAL frame on the driver branch (small graphs, gate=default)
    and the distributed branch (forced with driver_walk_max_edges=0)
    — same integer arithmetic, same tie order."""
    import random

    from kafana_spark.operators.similarity import (
        link_prediction_from_edges,
        modularity_from_assignment,
        pagerank_from_edges,
        ppr_from_edges,
        triangles_from_edges,
    )

    rng = random.Random(7)
    pairs = sorted({(a, b) for a, b in
                    ((rng.randrange(0, 40), rng.randrange(0, 40))
                     for _ in range(120)) if a < b})
    mu = edges(spark, pairs)
    asg = spark.createDataFrame(
        [(v, v % 3) for v in range(40)], ["vec_id", "cid"])

    def rows(df):
        return [tuple(r) for r in df.collect()]

    assert rows(pagerank_from_edges(mu, iters=3)) == \
        rows(pagerank_from_edges(mu, iters=3, driver_walk_max_edges=0))
    assert rows(ppr_from_edges(mu, seed_mod=5, iters=3)) == \
        rows(ppr_from_edges(mu, seed_mod=5, iters=3,
                            driver_walk_max_edges=0))
    assert rows(link_prediction_from_edges(mu, top_k=25)) == \
        rows(link_prediction_from_edges(mu, top_k=25,
                                        driver_walk_max_edges=0))
    assert rows(triangles_from_edges(mu)) == \
        rows(triangles_from_edges(mu, driver_walk_max_edges=0))
    assert rows(modularity_from_assignment(mu, asg)) == \
        rows(modularity_from_assignment(mu, asg,
                                        driver_walk_max_edges=0))
    # empty graph: both branches agree on the degenerate row shapes
    empty = spark.createDataFrame([], "a long, b long")
    for fn in (lambda m, **kw: pagerank_from_edges(m, **kw),
               lambda m, **kw: triangles_from_edges(m, **kw),
               lambda m, **kw: modularity_from_assignment(m, asg, **kw)):
        assert rows(fn(empty)) == rows(fn(empty, driver_walk_max_edges=0))
