"""Persisted IVF index — index-once / query-many for vector search.

The serving-time twin of ``operators/similarity.ivf_topk``: centroid
fitting and cell assignment are functions of the CORPUS only, so a real
deployment computes them at write time and answers every query from the
stored index (exactly how FAISS/Milvus-style IVF serving works, and the
ANN twin of the dedup index in ``dedup_index.py``).

Layout under one index root:

- ``<path>/centroids``   — (cid, cv, cnrm): the coarse quantizer.
- ``<path>/assignments`` — (vec_id, v, nrm, cid): one row per corpus
  vector per assigned cell (n_assign > 1 duplicates boundary vectors
  into adjacent cells for recall).

Queries read both tables and run probe + rank only: no KMeans refit, no
corpus re-assignment, no norms recomputed. Appending a new batch
assigns it against the STORED centroids (append-only; re-fit centroids
on drift by rebuilding — the standard IVF maintenance trade).

Store-backed results are pinned equal to the recompute-everything
``ivf_topk`` by tests/test_ann_index.py, and x58 hash-checks the
store roundtrip against the same DuckDB oracle as x08.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafana_spark.operators.similarity import (
    _ivf_assign, _ivf_centroids, _ivf_probe_rank, _vectors, _with_norm,
)

CENT_DIR = "centroids"
ASSIGN_DIR = "assignments"


def build_ann_index(df: DataFrame, path: str, centroid_mod: int = 40,
                    method: str = "modulo", n_assign: int = 1,
                    mode: str = "overwrite") -> None:
    """Fit the quantizer and persist centroids + cell assignments.

    Work: one (broadcast) pass of the corpus against the centroids,
    collapsed map-side to n_assign rows per vector — the same plan as
    the inline operator, paid once instead of per query.
    """
    corpus = _with_norm(_vectors(df))
    centroids = _ivf_centroids(df, corpus, method, centroid_mod)
    centroids.write.mode(mode).parquet(f"{path}/{CENT_DIR}")
    _ivf_assign(corpus, centroids, n_assign) \
        .write.mode(mode).parquet(f"{path}/{ASSIGN_DIR}")


def append_ann_index(df: DataFrame, path: str,
                     n_assign: int = 1) -> None:
    """Assign a NEW batch against the STORED centroids and append.

    Append-only: existing assignment rows never change. Centroids are
    not refit — monitor drift and rebuild when cell occupancy skews
    (the standard IVF maintenance trade)."""
    spark = df.sparkSession
    centroids = spark.read.parquet(f"{path}/{CENT_DIR}")
    corpus = _with_norm(_vectors(df))
    _ivf_assign(corpus, centroids, n_assign) \
        .write.mode("append").parquet(f"{path}/{ASSIGN_DIR}")


def ann_topk_from_index(spark: SparkSession, path: str,
                        queries: DataFrame, k: int = 10,
                        n_probe: int = 3) -> DataFrame:
    """Approximate top-k from the stored index: probe n_probe cells per
    query, rank members of those cells only. Reads centroids (tiny,
    broadcast) and the probed slice of the assignment table."""
    centroids = spark.read.parquet(f"{path}/{CENT_DIR}")
    assigned = spark.read.parquet(f"{path}/{ASSIGN_DIR}")
    return _ivf_probe_rank(assigned, centroids, queries, k, n_probe)
