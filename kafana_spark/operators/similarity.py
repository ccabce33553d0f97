"""Vector similarity search over an embedding column (SURVEY.md §2.E3).

- brute_force_topk: exact cosine top-k — the correctness baseline and
  the oracle-checked path.
- ivf_topk: IVF-style approximate search — deterministic coarse
  quantizer (modulo-sampled centroids), assignment shuffle on
  centroid id, probes limited to n_probe cells. This is the 100 TB
  path: the per-query work drops from O(N) to O(N * n_probe / n_cells),
  and the inner join is an equi-join on cell id (shuffle-partitionable)
  instead of a cross join.

All math is Column-expression only (kafana_spark.functions.cosine);
no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafana_spark.functions import as_double_array, dot, l2_norm


def _vectors(df: DataFrame) -> DataFrame:
    return df.select("vec_id", as_double_array(F.col("embedding")).alias("v"))


def _with_norm(df: DataFrame, v: str = "v") -> DataFrame:
    """Precompute the L2 norm once per vector — the pairwise stage then
    evaluates ONE array aggregate (the dot product) per pair instead of
    three (dot + both norms)."""
    return df.withColumn("nrm", l2_norm(F.col(v)))


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact cosine top-k for each query vector.

    queries: (qid, v) — typically few; broadcast against the corpus so
    the scan stays embarrassingly parallel (no shuffle of the corpus).
    Output: (qid, vec_id, cos, rank), self-matches excluded.
    """
    corpus = _with_norm(_vectors(df))
    q = _with_norm(queries)
    cos = F.round(dot(F.col("q.v"), F.col("c.v"))
                  / (F.col("q.nrm") * F.col("c.nrm")), 4)
    scored = (corpus.alias("c")
              .join(F.broadcast(q.alias("q")),
                    F.col("q.qid") != F.col("c.vec_id"))
              .select(F.col("q.qid").alias("qid"),
                      F.col("c.vec_id").alias("vec_id"),
                      cos.alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def modulo_queries(df: DataFrame, mod: int = 100) -> DataFrame:
    """Deterministic query subset: vec_id % mod == 0."""
    return _vectors(df).where(F.col("vec_id") % mod == 0) \
        .select(F.col("vec_id").alias("qid"), "v")


def kmeans_centroids(df: DataFrame, k: int, seed: int = 42,
                     max_iter: int = 10) -> DataFrame:
    """Fit MLlib KMeans over the corpus and return (cid, cv) centroid
    vectors — the quality upgrade over the modulo quantizer (cells
    follow the data distribution, so cell occupancy is balanced and
    probes hit true neighbors more often)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # fit on L2-normalized vectors (spherical k-means): on the unit
    # sphere euclidean and cosine orderings agree, so the euclidean
    # KMeans objective matches the cosine ranking used at probe time
    unit = F.transform(F.col("v"), lambda x: x / F.col("nrm"))
    vecs = (_with_norm(_vectors(df))
            .withColumn("fv", array_to_vector(unit)))
    model = KMeans(k=k, seed=seed, maxIter=max_iter,
                   featuresCol="fv").fit(vecs)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(model.clusterCenters())],
        "cid int, cv array<double>")


def ivf_topk(df: DataFrame, queries: DataFrame, k: int = 10,
             centroid_mod: int = 40, n_probe: int = 3,
             method: str = "modulo", n_assign: int = 1) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Coarse quantizer: ``method='modulo'`` uses vectors with
    vec_id % centroid_mod == 0 as centroids (deterministic, zero
    training cost); ``method='kmeans'`` fits MLlib KMeans with
    n/centroid_mod cells (balanced cells, better recall). Every corpus
    vector is assigned to its nearest centroid (broadcast join —
    centroids are tiny). Each query probes its n_probe nearest cells
    and ranks only those cells' members.

    ``n_assign > 1`` stores each corpus vector in its n nearest cells
    (multi-assignment IVF): storage grows n×, but boundary vectors
    become reachable from adjacent cells — the standard recall lever
    when n_probe alone plateaus.
    """
    corpus = _with_norm(_vectors(df))
    centroids = _ivf_centroids(df, corpus, method, centroid_mod)
    assigned = _ivf_assign(corpus, centroids, n_assign)
    return _ivf_probe_rank(assigned, centroids, queries, k, n_probe)


def _ivf_centroids(df: DataFrame, corpus: DataFrame, method: str,
                   centroid_mod: int) -> DataFrame:
    """(cid, cv, cnrm) coarse-quantizer centroids."""
    if method == "kmeans":
        n = corpus.count()
        raw = kmeans_centroids(df, k=max(2, n // centroid_mod))
        return raw.select("cid", "cv", l2_norm(F.col("cv")).alias("cnrm"))
    if method == "modulo":
        return corpus.where(F.col("vec_id") % centroid_mod == 0) \
            .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
                    F.col("nrm").alias("cnrm"))
    raise ValueError(f"method must be modulo|kmeans, got {method!r}")


def _ivf_assign(corpus: DataFrame, centroids: DataFrame,
                n_assign: int) -> DataFrame:
    """(vec_id, v, nrm, cid) cell assignment — one row per vector per
    assigned cell."""
    # assignment: nearest centroid(s) per corpus vector. The broadcast
    # join expands the frame centroids×, but the groupBy collapses it
    # back to one row per vec_id in the map-side partial aggregation —
    # the exchange moves |corpus| rows, never the expanded frame (the
    # r1 window-based argmax shuffled corpus×centroids rows, which at
    # 100 TB with ~1e4 cells IS the job). acos is rounded to 6dp so the
    # argmax ordering is reproducible across engines (oracle parity).
    ac = F.round(dot(F.col("x.v"), F.col("ct.cv"))
                 / (F.col("x.nrm") * F.col("ct.cnrm")), 6)
    expanded = (corpus.alias("x")
                .join(F.broadcast(centroids.alias("ct")))
                .select("vec_id", "v", "nrm", "cid", ac.alias("acos")))
    if n_assign <= 1:
        # argmax(acos desc, cid asc) == max of struct(acos, -cid):
        # struct comparison is lexicographic and map-side combinable.
        best = F.max(F.struct(F.col("acos"),
                              (-F.col("cid")).alias("ncid"))).alias("best")
        assigned = (expanded.groupBy("vec_id")
                    .agg(F.any_value(F.col("v")).alias("v"),
                         F.any_value(F.col("nrm")).alias("nrm"), best)
                    .select("vec_id", "v", "nrm",
                            (-F.col("best.ncid")).alias("cid")))
    else:
        # top-n cells per vector: sorted-slice of the collected
        # (−acos, cid) structs. The collected list is |centroids| long
        # pre-slice; acceptable while centroids stay ~1e4 — beyond
        # that, pre-bucket with a coarser quantizer first.
        cells = F.slice(
            F.array_sort(F.collect_list(
                F.struct((-F.col("acos")).alias("nacos"), F.col("cid")))),
            1, n_assign)
        assigned = (expanded.groupBy("vec_id")
                    .agg(F.any_value(F.col("v")).alias("v"),
                         F.any_value(F.col("nrm")).alias("nrm"),
                         cells.alias("cells"))
                    .select("vec_id", "v", "nrm",
                            F.explode("cells.cid").alias("cid")))

    return assigned


def _ivf_probe_rank(assigned: DataFrame, centroids: DataFrame,
                    queries: DataFrame, k: int, n_probe: int) -> DataFrame:
    """Probe n_probe nearest cells per query and rank only those
    cells' members (equi-join on cell id)."""
    # probe list: n_probe nearest centroids per query (queries are few —
    # a window over them is driver-trivial)
    q = _with_norm(queries)
    qc = F.round(dot(F.col("q.v"), F.col("ct.cv"))
                 / (F.col("q.nrm") * F.col("ct.cnrm")), 6)
    probe_w = Window.partitionBy("qid").orderBy(F.col("qcos").desc(),
                                                F.col("cid"))
    probes = (q.alias("q")
              .join(F.broadcast(centroids.alias("ct")))
              .select(F.col("qid"), F.col("q.v").alias("qv"),
                      F.col("q.nrm").alias("qnrm"),
                      F.col("cid"), qc.alias("qcos"))
              .withColumn("r", F.row_number().over(probe_w))
              .where(F.col("r") <= n_probe)
              .select("qid", "qv", "qnrm", "cid"))

    # rank within probed cells only (equi-join on cell id)
    cos = F.round(dot(F.col("p.qv"), F.col("m.v"))
                  / (F.col("p.qnrm") * F.col("m.nrm")), 4)
    scored = (probes.alias("p")
              .join(assigned.alias("m"), F.col("p.cid") == F.col("m.cid"))
              .where(F.col("p.qid") != F.col("m.vec_id"))
              .select(F.col("p.qid").alias("qid"),
                      F.col("m.vec_id").alias("vec_id"),
                      cos.alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (scored.dropDuplicates(["qid", "vec_id"])
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-class embedding centroids — elementwise mean vector of every
    label (nearest-class-mean classification, cluster health checks,
    IVF/PQ codebook seeding).

    Scale: posexplode expands to (label, pos, component) — a dim× row
    expansion, but the average is map-side combinable on (label, pos),
    so the shuffle carries one partial (sum, count) per (label, pos)
    per input partition, NOT the expanded rows. The centroid array is
    rebuilt with a per-label sort over dim elements. No driver-side
    math, no collect.
    """
    e = df.select(F.col(label_col).alias("label"),
                  F.posexplode(vec_col).alias("pos", "v"))
    agg = e.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    return (agg.groupBy("label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"]).alias("centroid")))


def int8_quantize(df: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization of an embedding column: per-vector
    max-abs scale, components mapped into [-127, 127] — the standard
    4× memory cut for an ANN corpus (recall impact pinned by test).

    Engine-portable determinism: q = FLOOR(x·127/maxabs). FLOOR, not
    round-half-anything — Spark truncates double→int casts while DuckDB
    rounds them, so an explicit FLOOR is the only mapping both engines
    agree on bit-for-bit (float→double widening is exact, and IEEE
    double ops are identical given identical expression shape).

    Scale: pure per-row column math, map-only — no shuffle, no UDF.
    The transform/array_max lambdas are interpreted, but over dim
    elements once per row at WRITE time; the read path consumes the
    int8 codes.
    """
    v = as_double_array(F.col(vec_col))
    # max(|x|) = max(max(x), -min(x)) — array_max/array_min are native
    # (codegen'd), vs an interpreted per-element abs() transform
    maxabs = F.greatest(F.array_max(v), -F.array_min(v))
    q = F.when(maxabs == 0, F.transform(v, lambda x: F.lit(0))) \
        .otherwise(F.transform(
            v, lambda x: F.floor(x * F.lit(127.0) / maxabs).cast("int")))
    return df.select(
        F.col(id_col),
        F.round(maxabs / F.lit(127.0), 8).alias("scale"),
        q.alias("q8"))


def dequantize(df: DataFrame, q_col: str = "q8",
               scale_col: str = "scale") -> DataFrame:
    """Inverse of int8_quantize (modulo quantization error): component
    ≈ q·scale. Used by the recall tests to bound the accuracy cost."""
    return df.withColumn(
        "v", F.transform(F.col(q_col),
                         lambda x: x.cast("double") * F.col(scale_col)))
