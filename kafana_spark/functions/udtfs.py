"""Python UDTF surface (SURVEY §2.D UDF/UDAF/UDTF row) — demo + policy.

The engine's production chunker is ``operators.text.chunk_windows``
(pure column expressions: JVM-side, codegen'd, zero Python in the hot
path). This module exposes the SAME semantics as a Spark 4 Python UDTF
to demonstrate the table-function extension surface — the tool a user
reaches for when an operator genuinely cannot be a column expression
(imperative multi-row emission with per-row state). Parity with the
column version is pinned by tests/test_text.py; policy stays
"column expressions first, Arrow-batched kernels second, UDTFs for
semantics the first two cannot express".
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


@udtf(returnType="chunk_id int, chunk_text string, chunk_tokens int")
class ChunkWindowsUDTF:
    """Sliding token windows (window=32, stride=24) as a table
    function: one input text row → ceil(n_tokens/stride) chunk rows.
    Mirrors text.chunk_windows including the ['']-for-empty-text
    tokenizer behavior (split on ' ' never yields an empty list)."""

    def eval(self, text: str):  # noqa: D102 — contract is the class doc
        toks = (text if text is not None else "").split(" ")
        start, cid = 0, 0
        while start < len(toks):
            w = toks[start:start + CHUNK_WINDOW]
            yield cid, " ".join(w), len(w)
            cid += 1
            start += CHUNK_STRIDE


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL LATERAL use."""
    spark.udtf.register("chunk_windows_udtf", ChunkWindowsUDTF)
