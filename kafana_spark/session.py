"""SparkSession builder with scale-appropriate defaults.

Defaults are chosen for correctness on local[N] test runs while staying
sane on a real cluster:

- AQE on (runtime re-plan: coalesce shuffle partitions, skew-join split)
- broadcast threshold left at default (10 MB) — small dims (region,
  nation, supplier at test SFs) broadcast automatically; the query layer
  additionally applies explicit ``broadcast()`` hints where the table is
  known-small by construction
- shuffle partitions sized by env (``SPARK_GRAFT_CPUS``) for local runs;
  on a cluster AQE coalescing makes the initial number less critical
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "kafana-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # events.parquet stores TIMESTAMP(NANOS); see sources/tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("KAFANA_SPARK_UI", "false"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs on a session we did not build.

    The driver hands our entry points an already-built SparkSession; the
    confs we rely on (legacy nanos parquet reads, UTC timestamps) are
    runtime-settable, so set them here idempotently.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
