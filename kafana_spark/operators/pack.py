"""Sequence packing for LLM training-data pipelines.

Training examples are fixed token budgets (context windows); documents
are variable-length. Packing greedily bins documents into sequences so
padding waste stays low. Exact global first-fit is inherently
sequential, so the scale shape is greedy packing WITHIN partitions
(range-partitioned by id so the layout is deterministic for a given
partition count): each partition packs independently — zero
coordination, and the waste penalty vs global packing is bounded by
one partial sequence per partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafana_spark.functions import tokens

PACK_SCHEMA = ("seq_id string, doc_id long, n_tokens int, "
               "seq_tokens int, seq_docs int")


def pack_sequences(df: DataFrame, budget: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int | None = None) -> DataFrame:
    """Greedy next-fit packing of documents into token-budget sequences.

    Returns one row per document: its sequence id (partition-qualified),
    the document's token count, and the sequence's total tokens and doc
    count. A document larger than the budget gets its own sequence
    (truncation is the caller's policy decision, not the packer's).

    Token counts are computed JVM-side (F.size over the token split);
    only the sequential bin-assignment runs in Python, over
    (id, n_tokens) pairs — a few bytes per document regardless of
    document size.
    """
    spark = df.sparkSession
    parts = num_partitions or spark.sparkContext.defaultParallelism
    sized = (df.select(F.col(id_col).alias("doc_id"),
                       F.size(tokens(F.col(text_col))).alias("n_tokens"))
             .repartitionByRange(parts, "doc_id")
             .sortWithinPartitions("doc_id")
             .withColumn("pid", F.spark_partition_id()))

    def packer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # state persists across Arrow batches of the same partition
        seq_no, fill, members = 0, 0, []
        out: list[tuple] = []
        pid = None

        def flush():
            nonlocal seq_no, fill, members
            for d, nt in members:
                out.append((f"{pid}-{seq_no}", d, nt, fill, len(members)))
            seq_no, fill, members = seq_no + 1, 0, []

        for pdf in batches:
            if len(pdf) and pid is None:
                pid = int(pdf["pid"].iloc[0])
            for d, nt in zip(pdf["doc_id"], pdf["n_tokens"]):
                nt = int(nt)
                if members and fill + nt > budget:
                    flush()
                members.append((int(d), nt))
                fill += nt
        if members:
            flush()
        yield pd.DataFrame(
            out, columns=["seq_id", "doc_id", "n_tokens",
                          "seq_tokens", "seq_docs"])

    return sized.mapInPandas(packer, PACK_SCHEMA)


def pack_sequences_sharded(df: DataFrame, budget: int = 2048,
                           n_shards: int = 8, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Deterministic twin of ``pack_sequences``: documents are sharded
    by a PORTABLE hash of their id (not by Spark partition), ordered by
    id within shard, and greedy-next-fit packed per shard — the layout
    is a pure function of the data, identical on any cluster/partition
    count, so the whole packing is oracle-checkable (x66). Use this
    when training-data layout must be reproducible across runs and
    engines; ``pack_sequences`` stays the zero-coordination scale
    variant (one partial sequence of waste per partition, but layout
    tied to partitioning).

    Scale: token sizing is JVM-side; the sequential next-fit runs per
    shard via applyInPandas over (id, n_tokens) pairs only — one
    shuffle on the shard key, shards sized by n_shards (pick ≥ cluster
    width; each shard's state is a running counter, not the corpus).
    """
    from kafana_spark.functions import portable_hash64

    k = F.col(id_col).cast("string")
    shard = F.pmod(portable_hash64(F.concat_ws("#", k, F.lit("pack"))),
                   F.lit(n_shards)).cast("int")
    sized = df.select(F.col(id_col).alias("doc_id"),
                      F.size(tokens(F.col(text_col))).alias("n_tokens"),
                      shard.alias("shard"))

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sh = int(key[0])
        pdf = pdf.sort_values("doc_id")
        out: list[tuple] = []
        seq_no, fill = 0, 0
        members: list[tuple[int, int]] = []

        def flush():
            nonlocal seq_no, fill, members
            for d, nt in members:
                out.append((f"{sh}-{seq_no}", d, nt, fill, len(members)))
            seq_no, fill, members = seq_no + 1, 0, []

        for d, nt in zip(pdf["doc_id"], pdf["n_tokens"]):
            nt = int(nt)
            if members and fill + nt > budget:
                flush()
            members.append((int(d), nt))
            fill += nt
        if members:
            flush()
        return pd.DataFrame(out, columns=["seq_id", "doc_id", "n_tokens",
                                          "seq_tokens", "seq_docs"])

    return sized.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)
