"""Text-analysis operators (SURVEY.md §2.E4): language ID, quality
scoring, token counting, document fingerprinting.

All scoring paths are pure Column expressions with DuckDB oracle twins;
the rolling-hash chunker is the one mapInPandas operator (content-
defined chunking is inherently sequential per document, not per row
set — the Arrow batch path keeps it vectorized per partition).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafana_spark.functions import tokens

# marker stopwords per language for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "et", "les", "est", "un"),
}
# literal CJK chars (not \u escapes): Java regex and DuckDB's RE2 both
# accept the raw range, while RE2 rejects \uXXXX escapes
CJK_PATTERN = "[一-鿿]"

STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "it")


#: BPE-ish pre-tokenizer regex (GPT-2 style, ASCII-simplified so Java
#: regex and DuckDB's RE2 agree): a token is an optionally-space-prefixed
#: letter run, digit run, or punctuation run.
BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def token_count(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace token count + distinct count + two BPE-ish subword
    estimates: chars/4 (the usual byte-pair heuristic) and a real
    pre-tokenizer regex count (GPT-2-style split)."""
    tok = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(tok).alias("n_tokens"),
        F.size(F.array_distinct(tok)).alias("n_uniq"),
        F.ceil(F.length(F.col(text_col)) / 4).cast("long").alias("n_subwords"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long")
        .alias("n_bpe"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK char ratio → zh, else argmax of
    marker-stopword hits (alphabetical tiebreak, 'und' = unknown)."""
    tok = F.array_distinct(tokens(F.lower(F.col(text_col))))
    scores = {
        lang: F.size(F.array_intersect(
            tok, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    cjk = F.length(F.regexp_replace(F.col(text_col), CJK_PATTERN, "")) \
        < F.length(F.col(text_col))
    # argmax with deterministic tiebreak: forward alphabetical order +
    # strict > means the alphabetically-first language wins ties
    best_lang, best_score = F.lit("und"), F.lit(0)
    for lang in sorted(scores):
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    pred = F.when(cjk, F.lit("zh")).otherwise(best_lang)
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Deterministic quality score in basis points [0, 10000]:
    0.4·length_score + 0.3·diversity + 0.3·stopword_presence.

    length_score  = min(n_tokens/100, 1)
    diversity     = n_uniq / n_tokens
    stopword_rate = fraction of tokens in STOPWORDS (capped at 0.2,
                    scaled — total stopword absence reads as low quality)

    Computed entirely in integer arithmetic (scaled by 10⁴) so the
    result is bit-identical across engines — float ROUND lands on .5
    boundaries for ratio-of-small-int scores and differs per engine.
    """
    tok = tokens(F.col(text_col))
    n = F.size(tok)
    uniq = F.size(F.array_distinct(tok))
    stop_hits = F.size(F.filter(
        tok, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS])))
    length_k = F.least(n, F.lit(100)) * 100                      # /100 * 1e4
    diversity_k = F.floor((F.lit(10000) * uniq + F.floor(n / 2)) / n)
    stop_k = F.least(F.floor(F.lit(50000) * stop_hits / n), F.lit(10000))
    quality = F.floor((F.lit(4) * length_k + F.lit(3) * diversity_k
                       + F.lit(3) * stop_k) / 10)
    return df.select(
        F.col(id_col),
        F.col("n_chars") if "n_chars" in df.columns else F.length(text_col).alias("n_chars"),
        quality.cast("long").alias("quality_bp"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", prefix_tokens: int = 8) -> DataFrame:
    """Document fingerprints: full-content md5 + head fingerprint
    (md5 of the first `prefix_tokens` tokens — catches truncation/
    near-prefix duplicates cheaply)."""
    tok = tokens(F.col(text_col))
    head = F.concat_ws(" ", F.slice(tok, 1, prefix_tokens))
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fp_full"),
        F.md5(head).alias("fp_head"),
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-k terms per document by tf-idf (pure SQL, oracle-checkable).

    tf    = term occurrences within the document (non-distinct)
    idf   = ln(N / df), df = number of documents containing the term
    score = ROUND(tf * idf, 4); ties broken by token ascending.

    Plan shape: one explode + two aggregations; the docs-count N and
    the per-token df ride in via a broadcast-able token-level frame
    (tokens ≪ corpus at scale after the groupBy).
    """
    from pyspark.sql.window import Window

    toks = df.select(F.col(id_col),
                     F.explode(tokens(F.col(text_col))).alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = (toks.groupBy("token")
               .agg(F.count_distinct(F.col(id_col)).alias("df")))
    n_docs = df.select(F.count(F.lit(1)).alias("n")).alias("nd")
    scored = (tf.join(docfreq, "token")
              .crossJoin(F.broadcast(n_docs))
              .select(F.col(id_col), "token",
                      F.round(F.col("tf") * F.log(F.col("n") / F.col("df")),
                              4).alias("tfidf")))
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(),
                                           F.col("token"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select(id_col, "token", "tfidf", F.col("rk").cast("int").alias("rk")))


# ------------------------------------------------------------ token bloom

#: sized for ~200 distinct tokens/doc: fill ≈ 1-e^(-3·200/1024) ≈ 0.44,
#: FPR ≈ 0.44³ ≈ 9% — 128 bytes/row buys ~10× scan reduction on
#: selective terms
BLOOM_BITS = 1024         # 16 longs per row
BLOOM_HASHES = 3


def token_bloom(text_col: "F.Column", bits: int = BLOOM_BITS,
                k: int = BLOOM_HASHES) -> "F.Column":
    """Per-row token bloom filter as ``array<long>`` (bits/64 words).

    The additive C5 skipping column from SURVEY §7.3.6: stored beside
    the document, it lets token searches prefilter rows with pure
    bitwise math before the expensive contains/token scan. Build cost
    is write-time only; false positives only cost a redundant verify.
    """
    words = bits // 64
    toks = F.array_distinct(tokens(F.lower(text_col)))
    zero = F.array_repeat(F.lit(0).cast("long"), words)

    def set_bit(w, mask):
        # closure factory: PySpark validates HOF lambda arity including
        # defaulted params, so bind w/mask outside the lambda
        return lambda x, i: F.when(i == w, x.bitwiseOR(mask)).otherwise(x)

    def add_token(acc, t):
        out = acc
        for seed in range(k):
            b = F.pmod(F.xxhash64(F.lit(seed), t), F.lit(bits))
            w = (b / 64).cast("int")
            mask = F.call_function(
                "shiftleft", F.lit(1).cast("long"), (b % 64).cast("int"))
            out = F.transform(out, set_bit(w, mask))
        return out

    return F.aggregate(toks, zero, add_token)


def bloom_might_contain(bloom_col: "F.Column", term: str,
                        bits: int = BLOOM_BITS,
                        k: int = BLOOM_HASHES) -> "F.Column":
    """Membership test against a token_bloom column — false positives
    possible (verify after), false negatives impossible. The term's
    hash is constant-folded by Catalyst, so per row this is k array
    lookups + ANDs."""
    cond = F.lit(True)
    t = F.lit(term.lower())
    for seed in range(k):
        b = F.pmod(F.xxhash64(F.lit(seed), t), F.lit(bits))
        word = F.element_at(bloom_col, (b / 64).cast("int") + 1)
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (b % 64).cast("int"))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


# ----------------------------------------------------- rolling-hash chunks

CHUNK_SCHEMA = "doc_id long, chunk_idx int, chunk_hash long, chunk_len int"


def rolling_hash_chunks(df: DataFrame, window: int = 16,
                        mask_bits: int = 5, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Content-defined chunking via Karp-Rabin rolling hash.

    A chunk boundary falls wherever the rolling hash of the last
    `window` bytes has its low `mask_bits` bits zero (expected chunk
    ≈ 2^mask_bits bytes). Chunk hashes enable chunk-level dedup of
    giant documents — the standard CDC trick (LBFS/rsync lineage).

    Sequential per document ⇒ mapInPandas (Arrow-batched, one pass per
    partition; no shuffle — chunking is embarrassingly parallel).
    """
    b, m = 257, (1 << 61) - 1
    bw = pow(b, window, m)
    mask = (1 << mask_bits) - 1

    def chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple[int, int, int, int]] = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                data = text.encode("utf-8")
                h, start, idx = 0, 0, 0
                for i, byte in enumerate(data):
                    h = (h * b + byte) % m
                    if i >= window:
                        h = (h - data[i - window] * bw) % m
                    if i + 1 - start >= window and (h & mask) == 0:
                        chunk = data[start:i + 1]
                        out.append((doc_id, idx,
                                    hash_bytes(chunk), len(chunk)))
                        start, idx = i + 1, idx + 1
                if start < len(data):
                    chunk = data[start:]
                    out.append((doc_id, idx, hash_bytes(chunk), len(chunk)))
            yield pd.DataFrame(
                out, columns=["doc_id", "chunk_idx", "chunk_hash",
                              "chunk_len"])

    return df.select(id_col, text_col).mapInPandas(chunker, CHUNK_SCHEMA)


def hash_bytes(data: bytes) -> int:
    """Stable 61-bit polynomial hash of a byte string."""
    h, m = 0, (1 << 61) - 1
    for byte in data:
        h = (h * 257 + byte) % m
    return h
