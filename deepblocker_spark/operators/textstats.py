"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting. All pure Column
expressions (whole-stage codegen; zero Python in the hot path), built on
the shared parity tokenizer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deepblocker_spark.functions.tokenizer import tokens_col

# Tiny marker-word inventories for the n-gram/stopword language heuristic.
# Deterministic and engine-portable (plain set membership counts).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "are"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "sur"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "den"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "it", "on", "as", "at", "by", "be"]


def token_count_col(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def punct_ratio_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    # explicit ASCII class (not \s): Java regex and RE2 must agree exactly
    punct = F.regexp_replace(c, r"[a-zA-Z0-9 \t\n\r\f\x0b]", "")
    return F.when(
        F.length(c) > 0, F.length(punct) / F.length(c)
    ).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column | str, stopwords: list[str] | None = None) -> Column:
    toks = tokens_col(text)
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_col(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    mean word length band. Deterministic arithmetic only."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens_col(c)
    n_tok = F.size(toks)
    n_char = F.length(c)
    mean_wl = F.when(n_tok > 0, n_char / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio_col(c) * 4, F.lit(1.0))
    wl_score = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score + punct_score + wl_score) / 3.0, 6)


def lang_scores(text: Column | str) -> list[tuple[str, Column]]:
    toks = tokens_col(text)
    out = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out.append((lang, F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))))
    return out


def lang_id_col(text: Column | str) -> Column:
    """Argmax of marker hits with deterministic tie-break (lang name asc;
    'und' when nothing matches)."""
    scores = lang_scores(text)
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    for lang, s in sorted(scores, key=lambda p: p[0], reverse=True):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def normalized_fingerprint_col(text: Column | str) -> Column:
    """Whitespace/punct-normalized content hash: md5 of the joined token
    stream — equal for documents differing only in layout."""
    return F.md5(F.concat_ws(" ", tokens_col(text)))


def shingle_min_fingerprint_col(text: Column | str, n: int = 3) -> Column:
    """Winnowing-lite rolling-hash fingerprint: minimum md5 over token
    n-gram shingles (None when fewer than n tokens)."""
    from deepblocker_spark.operators.dedup import token_shingles

    sh = token_shingles(tokens_col(text), n)
    return F.array_min(F.transform(sh, F.md5))


def document_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-pass profile: counts, ratios, quality, language, fingerprints."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count_col(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(punct_ratio_col(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio_col(t), 6).alias("stopword_ratio"),
        quality_score_col(t).alias("quality"),
        lang_id_col(t).alias("lang_pred"),
        normalized_fingerprint_col(t).alias("fingerprint"),
    )


def quantile_bands(
    df: DataFrame,
    score_col: str,
    n_bands: int = 4,
) -> DataFrame:
    """Quality-band bucketing: assign every row its ``n_bands``-quantile
    band of ``score_col`` (1 = lowest) — the curation step a training
    pipeline runs before per-band sampling rates (pair with
    sampling.stratified_hash_sample on the band column).

    Boundaries come from ONE exact interpolated-percentile aggregate
    (ANSI percentile_cont semantics — engine-portable: on integer-valued
    scores with dyadic quantile fractions the interpolation is exact in
    doubles, so DuckDB reproduces the banding bit-for-bit; full value
    oracle). The 1-row boundary frame broadcast-crosses back; the band is
    a codegen comparison chain. At 100 TB with a continuous score swap
    the aggregate for ``percentile_approx`` — same plan shape, banding
    logic unchanged. No collect, no Python, no row-scale shuffle."""
    if n_bands < 2:
        raise ValueError("n_bands must be >= 2")
    qs = F.array(*[F.lit(i / n_bands) for i in range(1, n_bands)])
    b = df.agg(F.percentile(F.col(score_col), qs).alias("_b"))
    out = df.crossJoin(F.broadcast(b))
    band = F.lit(1)
    for i in range(1, n_bands):
        band = band + (F.col(score_col) > F.element_at(F.col("_b"), i)).cast("int")
    return out.withColumn("band", band).drop("_b")


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1 —
    the within-document repetition filters of the MassiveText/RefinedWeb
    lineage), token-occurrence variants so both engines compute them
    exactly:

      dup_line_frac     fraction of the doc's lines that are repeats of
                        another line (1 − distinct/total; 0 for 1-line
                        docs) — pure array exprs, no explode
      top_bigram_frac   fraction of token-bigram OCCURRENCES taken by the
                        doc's most frequent bigram (0 when < 2 tokens);
                        ties break on the lexicographically greatest
                        bigram via a struct max — two hash aggs, no window
      dup_trigram_frac  fraction of token-trigram occurrences belonging
                        to trigrams that occur ≥ 2 times in the doc

    Shape: the line stats ride the scan projection; the n-gram stats are
    one explode + two hash aggregations each (partial aggregation
    map-side), joined back by id — no window, no UDF, no driver state.
    High values on any of the three are the standard "repeated boilerplate
    / degenerate generation" removal rule before LLM training.
    """
    # occurrence-preserving n-grams: dedup.token_shingles is distinct by
    # design (Jaccard semantics) — repetition stats need every occurrence
    def _ngrams(tokens: Column, n: int) -> Column:
        idx = F.sequence(F.lit(0), F.size(tokens) - n)
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n))
        )
        empty = F.array().cast("array<string>")
        return F.when(F.size(tokens) >= n, grams).otherwise(empty)

    t = F.col(text_col)
    lines = F.split(t, "\n")
    base = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.size(lines) > 0,
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
        )
        .otherwise(0.0)
        .alias("dup_line_frac"),
        tokens_col(t).alias("_toks"),
    )

    def _grams(n: int) -> DataFrame:
        return (
            base.select("id", F.explode(_ngrams(F.col("_toks"), n)).alias("g"))
            .groupBy("id", "g")
            .agg(F.count("*").alias("c"))
        )

    bi = (
        _grams(2)
        .groupBy("id")
        .agg(
            F.max(F.struct(F.col("c"), F.col("g"))).alias("_top"),
            F.sum("c").alias("_tot"),
        )
        .select("id", (F.col("_top.c") / F.col("_tot")).alias("top_bigram_frac"))
    )
    tri = (
        _grams(3)
        .groupBy("id")
        .agg(
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("_dup"),
            F.sum("c").alias("_tot"),
        )
        .select("id", (F.col("_dup") / F.col("_tot")).alias("dup_trigram_frac"))
    )
    return (
        base.drop("_toks")
        .join(bi, "id", "left")
        .join(tri, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round("dup_line_frac", 9).alias("dup_line_frac"),
            F.round(F.coalesce("top_bigram_frac", F.lit(0.0)), 9).alias(
                "top_bigram_frac"
            ),
            F.round(F.coalesce("dup_trigram_frac", F.lit(0.0)), 9).alias(
                "dup_trigram_frac"
            ),
        )
    )


# PII patterns chosen for Java-regex / RE2 (DuckDB) parity: plain character
# classes + \b word boundaries only — no lookarounds, no backrefs, so both
# engines match the identical spans. The long-digit-run rule is the blunt
# "account-number-shaped" catch-all used by public curation pipelines.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "digit_run": (r"\b\d{9,}\b", "<NUM>"),
}


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Replace email / IPv4 / long-digit-run spans with typed sentinels and
    attach per-category match counts (``n_email``, ``n_ipv4``,
    ``n_digit_run``) — the pre-training scrub step. Pure codegen
    (`regexp_replace` + `regexp_extract_all`): the scan streams once, no
    shuffle, partition-preserving. Patterns are applied in the declared
    order on the ORIGINAL text for counting but sequentially for
    replacement (an email's digits are already gone when digit_run runs).

    Raises if the input already carries any generated column name
    (``n_<category>`` or ``out_col``) — the ``select('*', ...)`` would
    otherwise silently produce duplicate column names and make every
    downstream reference ambiguous (ADVICE r4).
    """
    generated = [f"n_{name}" for name in PII_PATTERNS] + [out_col]
    clash = sorted(set(generated) & set(df.columns))
    if clash:
        raise ValueError(
            f"redact_pii: input already has column(s) {clash}; rename or "
            "drop them first (or pass a different out_col)"
        )
    t = F.col(text_col)
    red = t
    counts = []
    for name, (pat, sub) in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, sub)
    return df.select("*", *counts, red.alias(out_col))
