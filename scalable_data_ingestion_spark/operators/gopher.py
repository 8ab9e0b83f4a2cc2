"""Gopher-style rule-based document quality filtering.

The heuristic pre-filter stack from Rae et al., "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher" (2021),
Appendix A1.1 — the standard first-pass gate in public LLM data
pipelines (reused by MassiveText, RefinedWeb, Dolma): documents are
dropped by cheap structural rules before any model-based scoring.

Rules implemented (canonical thresholds):
- word count in [50, 100000]
- mean word length in [3, 10] characters
- symbol-to-word ratio (# and ellipsis) <= 0.1
- fraction of words containing an alphabetic character >= 0.80
- contains >= 2 distinct stopwords ("stop word" filter)

Every rule is a pure column expression over one tokenization — no
UDFs, no shuffle (the output is row-per-document with per-rule flags,
so the plan is scan -> project). At 100 TB this runs at parquet-scan
speed and composes with the downstream quality/dedup stages
(pipe_curation_funnel shows the composition pattern).

The per-rule booleans are emitted (not just the final verdict) because
production curation tracks *why* documents fail — rule-level drop
rates are the observability signal that catches a bad crawl snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

G_MIN_WORDS, G_MAX_WORDS = 50, 100_000
G_MIN_MWL, G_MAX_MWL = 3.0, 10.0
G_MAX_SYMBOL_RATIO = 0.1
G_MIN_ALPHA_FRAC = 0.80
G_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
G_MIN_STOPWORDS = 2

_STOP_SQL = " + ".join(
    f"CASE WHEN list_contains(toks, '{s}') THEN 1 ELSE 0 END" for s in G_STOPWORDS
)

_GOPHER_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang, trim(lower(text)) AS txt FROM documents
),
tok AS (
  SELECT doc_id, lang, txt, string_split_regex(txt, '\\s+') AS toks FROM base
),
m AS (
  SELECT doc_id, lang,
         len(toks) AS n_words,
         round(CAST(len(regexp_replace(txt, '\\s+', '', 'g')) AS DOUBLE)
               / len(toks), 6) AS mean_word_len,
         round(CAST(len(txt) - len(replace(txt, '#', ''))
                    + len(txt) - len(replace(txt, '...', '..')) AS DOUBLE)
               / len(toks), 6) AS symbol_ratio,
         round(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
               / len(toks), 6) AS alpha_frac,
         ({_STOP_SQL}) AS n_stopwords
  FROM tok
)
SELECT doc_id, lang,
       CAST(n_words AS BIGINT) AS n_words,
       mean_word_len, symbol_ratio, alpha_frac,
       CAST(n_stopwords AS INTEGER) AS n_stopwords,
       (n_words >= {G_MIN_WORDS} AND n_words <= {G_MAX_WORDS}) AS pass_word_count,
       (mean_word_len >= {G_MIN_MWL} AND mean_word_len <= {G_MAX_MWL})
         AS pass_mean_word_len,
       (symbol_ratio <= {G_MAX_SYMBOL_RATIO}) AS pass_symbol_ratio,
       (alpha_frac >= {G_MIN_ALPHA_FRAC}) AS pass_alpha_frac,
       (n_stopwords >= {G_MIN_STOPWORDS}) AS pass_stopwords,
       (n_words >= {G_MIN_WORDS} AND n_words <= {G_MAX_WORDS}
        AND mean_word_len >= {G_MIN_MWL} AND mean_word_len <= {G_MAX_MWL}
        AND symbol_ratio <= {G_MAX_SYMBOL_RATIO}
        AND alpha_frac >= {G_MIN_ALPHA_FRAC}
        AND n_stopwords >= {G_MIN_STOPWORDS}) AS keep
FROM m
"""


@register("txt_gopher_rules", oracle=_GOPHER_ORACLE)
def txt_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule metrics, per-rule pass flags, and the
    conjunction verdict — one scan, pure expressions."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.trim(F.lower("text")).alias("txt")
    )
    toks = F.split(F.col("txt"), r"\s+")
    d = docs.select("doc_id", "lang", "txt", toks.alias("toks"))

    n_words = F.size("toks")
    mean_word_len = (
        F.length(F.regexp_replace("txt", r"\s+", "")).cast("double") / n_words
    )
    hash_count = F.length("txt") - F.length(F.replace(F.col("txt"), F.lit("#")))
    # each "..." shrinks by 1 char when replaced with ".." — counts
    # non-overlapping ellipsis occurrences, same as the oracle.
    ellipsis_count = F.length("txt") - F.length(
        F.replace(F.col("txt"), F.lit("..."), F.lit(".."))
    )
    symbol_ratio = (hash_count + ellipsis_count).cast("double") / n_words
    alpha_frac = (
        F.size(F.filter("toks", lambda x: x.rlike("[a-z]"))).cast("double") / n_words
    )
    n_stop = None
    for s in G_STOPWORDS:
        term = F.when(F.array_contains("toks", s), 1).otherwise(0)
        n_stop = term if n_stop is None else n_stop + term

    # flags are computed from the ROUNDED metrics (6 dp) in both
    # engines, so threshold comparisons can never disagree on
    # sub-rounding float noise.
    m = d.select(
        "doc_id",
        "lang",
        n_words.cast("bigint").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("int").alias("n_stopwords"),
    )
    pass_wc = (F.col("n_words") >= G_MIN_WORDS) & (F.col("n_words") <= G_MAX_WORDS)
    pass_mwl = (F.col("mean_word_len") >= G_MIN_MWL) & (
        F.col("mean_word_len") <= G_MAX_MWL
    )
    pass_sr = F.col("symbol_ratio") <= G_MAX_SYMBOL_RATIO
    pass_af = F.col("alpha_frac") >= G_MIN_ALPHA_FRAC
    pass_sw = F.col("n_stopwords") >= G_MIN_STOPWORDS
    return m.select(
        "doc_id",
        "lang",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_frac",
        "n_stopwords",
        pass_wc.alias("pass_word_count"),
        pass_mwl.alias("pass_mean_word_len"),
        pass_sr.alias("pass_symbol_ratio"),
        pass_af.alias("pass_alpha_frac"),
        pass_sw.alias("pass_stopwords"),
        (pass_wc & pass_mwl & pass_sr & pass_af & pass_sw).alias("keep"),
    )
