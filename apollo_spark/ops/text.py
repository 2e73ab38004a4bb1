"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table.

Language-ID (stopword heuristic), quality scoring, token counting, and
order-sensitive document fingerprinting. Everything is a JVM-side column
expression — no Python UDFs — so the operators stay inside whole-stage
codegen and scale linearly with input splits (no shuffle at all except
where noted). Analogous role to the reference's feature-extraction
front end (/root/reference/apollo/bags.py:52-57 delegating to sourced-ml
extractors); here the extractors are relational.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small English stopword list shared with the SQL oracles (keep sorted).
EN_STOPWORDS = ["a", "an", "and", "for", "in", "is", "of", "on", "the",
                "to", "with"]

FP_MOD = 1_000_000_007  # fingerprint modulus (fits intermediate bigint math)


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokens. Inputs are space-normalized; for raw corpora a
    regexp split on ``\\s+`` drops in here."""
    return F.split(F.trim(F.col(text)), " ")


def md5_long(col: Column, hexdigits: int = 15) -> Column:
    """Deterministic 4·hexdigits-bit integer from md5 — the engine's
    portable hash (same value computable in any SQL engine; used instead
    of xxhash64 wherever cross-engine reproducibility matters)."""
    return F.conv(F.substring(F.md5(col), 1, hexdigits), 16, 10) \
        .cast("long")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_counted) — whitespace token count plus a
    BPE-ish subword estimate (ceil of chars/4, a common tokens-per-byte
    rule of thumb for byte-level BPE)."""
    toks = tokens_col()
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.col("text")).cast("long").alias("n_chars_counted"),
        F.ceil(F.length(F.col("text")) / F.lit(4.0)).cast("long")
        .alias("n_bpe_est"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Per-document quality features + composite score.

    Features follow the standard web-corpus filters (Gopher/C4-style):
    length, mean token length, type-token ratio, stopword ratio. The
    composite is a deterministic rational combination so the value is
    exactly reproducible in the SQL oracle.
    """
    toks = tokens_col()
    n_tok = F.size(toks).cast("double")
    distinct_ratio = (F.size(F.array_distinct(toks)).cast("double") / n_tok)
    stop_ratio = (
        F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
        .cast("double") / n_tok)
    mean_tok_len = ((F.length("text") - (n_tok - 1)) / n_tok)
    score = (F.least(n_tok / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
             + distinct_ratio * F.lit(0.3)
             + F.least(stop_ratio * F.lit(10.0), F.lit(1.0)) * F.lit(0.3))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, threshold: float = 0.08) -> DataFrame:
    """Heuristic language ID: stopword-hit ratio against an English marker
    list (the cheap n-gram/stopword family of detectors). Emits the ratio
    and the decision so downstream filters can re-threshold. distinct-hit
    based (array_intersect) — deterministic and oracle-reproducible."""
    toks = tokens_col()
    ratio = (F.size(F.array_intersect(
        toks, F.array(*[F.lit(w) for w in EN_STOPWORDS])))
        .cast("double") / F.size(toks))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unknown"))
        .alias("pred_lang"),
    )


def term_frequencies(docs: DataFrame) -> DataFrame:
    """A2 TF per (doc, feature) — the relational twin of the reference's
    in-bag term counts (the `value` of bags rows before IDF,
    /root/reference/apollo/bags.py:15-17): (doc_id, token, tf). One explode
    + one keyed shuffle with map-side partial aggregation."""
    return (docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        F.explode(tokens_col()).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf")))


def lang_filter(docs: DataFrame, lang: str = "en",
                threshold: float = 0.08) -> DataFrame:
    """P5 language filter (reference doc/cmd/bags.md:9 "keep only selected
    languages", delegated there to sourced-ml): documents whose predicted
    language matches ``lang``. A plain filter over lang_id — pushes down to
    the scan side of any downstream dedup pass."""
    return lang_id(docs, threshold).filter(F.col("pred_lang") == lang)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Order-sensitive document fingerprint (rolling-hash family):

        fp = sum_i (i+1) * md5_28bit(token_i)  mod 1e9+7

    Position-weighted so token reordering changes the value (unlike a bag
    hash), while staying a pure column expression: posexplode + one agg.
    One shuffle on doc_id (map-side partial agg applies)."""
    t = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.posexplode(tokens_col()).alias("pos", "tok"))
    tv = md5_long(F.col("tok"), 7)  # 28 bits -> no overflow in the sum
    return (t.select("doc_id",
                     ((F.col("pos") + 1) * tv).alias("term"))
            .groupBy("doc_id")
            .agg(F.pmod(F.sum("term"), F.lit(FP_MOD)).cast("long")
                 .alias("fingerprint")))
