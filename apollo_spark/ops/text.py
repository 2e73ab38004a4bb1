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


def _ngram_col(tk: Column, n: int) -> Column:
    """Space-joined n-grams of a token array as a per-row array column.
    Empty (same element type) when the document has fewer than n tokens —
    built with slice(_,1,0) so no when/otherwise type-cast is needed."""
    idx = F.sequence(F.lit(1), F.size(tk) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(tk, (i + j).cast("int")) for j in range(n)]))
    return F.when(F.size(tk) >= n, grams).otherwise(F.slice(tk, 1, 0))


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition/boilerplate signals (Rae et al. 2021,
    "Scaling Language Models" appendix A1.1 repetitious-text filters),
    adapted from character-mass to token-count fractions because the
    corpus rows are caption-length:

      top2_mass      — share of 2-grams held by the most frequent 2-gram
                       (the raw Gopher signal, emitted for re-thresholding)
      top2_excess    — (top count - 1) / n_grams: the mode's mass beyond
                       the all-distinct baseline. This is what the keep
                       flag thresholds — raw top2_mass is 1/(n-1) even for
                       a perfectly clean short caption, so Gopher's
                       long-document bar would misfire at caption length.
      dup3_frac      — share of 3-grams that occur more than once
      rep_token_frac — 1 - distinct/total tokens
      keep_repetition — excess/dup3/rep under 0.20 / 0.18 / 0.30
                        (Gopher-ish bars; re-thresholdable downstream
                        since the raw fractions are emitted)

    Zero-shuffle by construction: every signal is a higher-order array
    expression per row (narrow map over the scan, no explode, no
    groupBy). The n-gram mode uses an O(g²) filter-count per row — g is
    caption length, so this stays cheap and keeps the whole operator in
    one whole-stage-codegen span; the relational twin (explode + two
    keyed aggs) is what the DuckDB oracle runs, making the oracle an
    independent derivation rather than the same expression replayed.
    Fractions are rounded to 6 dp BEFORE thresholding so the keep flag
    compares identically in both engines.
    """
    toks = tokens_col()
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       toks.alias("tk"))
    tk = F.col("tk")
    g2, g3 = _ngram_col(tk, 2), _ngram_col(tk, 3)
    n2, n3 = F.size(g2), F.size(g3)
    top2 = F.coalesce(F.array_max(F.transform(
        g2, lambda g: F.size(F.filter(g2, lambda x: x == g)))), F.lit(0))
    dup3 = F.size(F.filter(
        g3, lambda g: F.size(F.filter(g3, lambda x: x == g)) > 1))
    rep_tok = ((F.size(tk) - F.size(F.array_distinct(tk))).cast("double")
               / F.size(tk))
    out = base.select(
        "doc_id",
        F.round(F.when(n2 > 0, top2.cast("double") / n2)
                .otherwise(F.lit(0.0)), 6).alias("top2_mass"),
        F.round(F.when(n2 > 0, (top2 - 1).cast("double") / n2)
                .otherwise(F.lit(0.0)), 6).alias("top2_excess"),
        F.round(F.when(n3 > 0, dup3.cast("double") / n3)
                .otherwise(F.lit(0.0)), 6).alias("dup3_frac"),
        F.round(rep_tok, 6).alias("rep_token_frac"),
    )
    return out.withColumn(
        "keep_repetition",
        (F.col("top2_excess") <= 0.20) & (F.col("dup3_frac") <= 0.18)
        & (F.col("rep_token_frac") <= 0.30))


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


def span_dedup(docs: DataFrame, span: int = 10) -> DataFrame:
    """C4-style cross-document span deduplication (Raffel et al. 2020 §2.2
    "we discarded all but one of any three-sentence span occurring more
    than once"), adapted from sentence spans to NON-OVERLAPPING ``span``-
    token windows because this corpus carries no sentence boundaries:

      every document is cut into consecutive ``span``-token pieces (the
      tail piece may be shorter); a piece is kept iff it is the FIRST
      occurrence of that exact text in the corpus under the deterministic
      global order (doc_id, span_idx). Output per document:

      (doc_id, n_spans, n_kept, clean_text)  — clean_text is the kept
      pieces re-joined in order ('' when every piece was a duplicate).

    Plan shape: one narrow explode (transform + posexplode — no Python),
    a groupBy(span_text) min-struct aggregate to elect first occurrences
    (map-side combinable, so corpus-wide boilerplate spans — the hot keys
    by construction — collapse to one row per partition before the
    exchange), a join back on span_text, and one groupBy(doc_id) to
    reassemble. The join's stream side concentrates a hot span's
    occurrences onto one task; that is a plain equi-join, so AQE's
    skew-split (enabled session-wide) shards it at runtime — unlike the
    bucketed self-joins (ops/skew.py) there is no quadratic blow-up to
    salt against, only row routing. Election-by-aggregation was chosen
    over a row_number() window for exactly that reason: the window form
    shuffles every occurrence to one task with no partial-combine escape.
    """
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       tokens_col().alias("tk"))
    nspans = F.ceil(F.size("tk") / F.lit(span)).cast("long")
    pieces = F.transform(
        F.sequence(F.lit(0), (nspans - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice("tk", i * span + 1, span)))
    spans = base.select("doc_id", F.posexplode(pieces)
                        .alias("span_idx", "span_text"))
    firsts = (spans.groupBy("span_text")
              .agg(F.min(F.struct("doc_id", "span_idx")).alias("first")))
    kept = (spans.join(firsts, "span_text")
            .filter((F.col("doc_id") == F.col("first.doc_id"))
                    & (F.col("span_idx") == F.col("first.span_idx")))
            .select("doc_id", "span_idx", "span_text"))
    reassembled = (kept.groupBy("doc_id")
                   .agg(F.count(F.lit(1)).alias("n_kept"),
                        F.array_join(
                            F.transform(
                                F.array_sort(F.collect_list(
                                    F.struct("span_idx", "span_text"))),
                                lambda s: s["span_text"]), " ")
                        .alias("clean_text")))
    return (base.select("doc_id", nspans.alias("n_spans"))
            .join(reassembled, "doc_id", "left")
            .select("doc_id", "n_spans",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text")))


def decontaminate(docs: DataFrame, bench: DataFrame,
                  n: int = 13) -> DataFrame:
    """GPT-3-style training-set decontamination (Brown et al. 2020
    appendix C: drop training documents sharing any 13-gram with a
    benchmark/eval set). ``bench`` is any DataFrame with a ``text``
    column; a corpus document is ``contaminated`` iff at least one of its
    ``n``-token grams (whitespace tokens, same tokenizer as every text
    op) appears anywhere in ``bench``. Output per corpus document:

      (doc_id, n_grams, contaminated, keep_decontaminated)

    Documents shorter than ``n`` tokens have no grams and are never
    contaminated. Joining is on the literal gram STRING — exact by
    construction (a hashed twin would trade a broadcast-map byte factor
    for a collision-false-positive probability; at the benchmark sizes
    this targets, the strings fit).

    Plan shape for the 100 TB case: the benchmark side is tiny relative
    to the corpus (that is the premise of decontamination), so its
    distinct gram set BROADCASTS and the corpus-side probe is a map-side
    left-semi join over a narrow explode — zero corpus shuffle until the
    per-doc distinct (combinable, keys are doc ids: no hot key possible).
    The final flag join is left unhinted on purpose: the contaminated-id
    set is usually small enough for AQE to broadcast at runtime, and when
    a pathological corpus is 90% contaminated a sort-merge that can spill
    is the right fallback — exactly the decision AQE makes from the
    measured size.
    """
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       tokens_col().alias("tk"))
    grams = _ngram_col(F.col("tk"), n)
    bench_grams = (bench.select(tokens_col().alias("tk"))
                   .select(F.explode(_ngram_col(F.col("tk"), n)).alias("g"))
                   .distinct())
    hits = (base.select("doc_id", F.explode(grams).alias("g"))
            .join(F.broadcast(bench_grams), "g", "left_semi")
            .select("doc_id").distinct()
            .withColumn("hit", F.lit(True)))
    return (base.select("doc_id", F.size(grams).cast("long")
                        .alias("n_grams"))
            .join(hits, "doc_id", "left")
            .select("doc_id", "n_grams",
                    F.coalesce("hit", F.lit(False)).alias("contaminated"))
            .withColumn("keep_decontaminated", ~F.col("contaminated")))
