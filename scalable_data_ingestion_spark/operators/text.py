"""Text-analysis operators over the documents table (north-star LLM
pipeline surface, SURVEY.md §7 step 8).

All operators are pure column expressions / explode+agg plans — no
Python UDFs — so they scale: tokenization stays in codegen, the only
shuffles are the per-doc aggregations, and everything pushes column
pruning down to the parquet scan (only ``text``/``doc_id`` are read).

Scale notes (100 TB of documents):
- explode(tokens) multiplies rows ~Nx; counts are computed with
  partial aggregation before any shuffle, so network traffic is one
  row per (doc, distinct-token), not per token.
- Fingerprints are md5 (same function exists in the DuckDB oracle,
  deterministic across engines and partitionings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

# Simple multilingual stopword list for the heuristic language/quality
# scoring (works on the synthetic vocab; a real deployment plugs in a
# per-language list).
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens_col(text="text"):
    return F.split(F.trim(F.col(text)), r"\s+")


# --------------------------------------------------------------------------
# token statistics per document.
# --------------------------------------------------------------------------
@register(
    "txt_token_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS INTEGER)
               AS n_distinct_tokens,
           round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\s+')), 6) AS avg_token_len
    FROM documents
    """,
)
def txt_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(toks), 6
        ).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# heuristic quality scoring: stopword ratio, lexical diversity, length.
# --------------------------------------------------------------------------
@register(
    "txt_quality_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    stats AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             CAST(count(DISTINCT tok) AS DOUBLE) / count(*) AS diversity,
             avg(CASE WHEN tok IN {STOPWORDS} THEN 1.0 ELSE 0.0 END) AS stop_ratio
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           round(diversity, 6) AS lexical_diversity,
           round(stop_ratio, 6) AS stopword_ratio,
           CASE WHEN n_tokens >= 20 AND diversity >= 0.2 THEN 'keep' ELSE 'flag' END
               AS quality_flag
    FROM stats
    """,
)
def txt_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens_l"),
        (F.countDistinct("tok").cast("double") / F.count(F.lit(1))).alias("diversity"),
        F.avg(F.when(F.col("tok").isin(*STOPWORDS), 1.0).otherwise(0.0)).alias("stop_ratio"),
    )
    return stats.select(
        "doc_id",
        F.col("n_tokens_l").cast("int").alias("n_tokens"),
        F.round("diversity", 6).alias("lexical_diversity"),
        F.round("stop_ratio", 6).alias("stopword_ratio"),
        F.when((F.col("n_tokens_l") >= 20) & (F.col("diversity") >= 0.2), "keep")
        .otherwise("flag")
        .alias("quality_flag"),
    )


# --------------------------------------------------------------------------
# corpus statistics per language/source.
# --------------------------------------------------------------------------
@register(
    "txt_corpus_stats",
    oracle=r"""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT)
               AS total_tokens,
           round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def txt_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col()).cast("bigint")).cast("bigint").alias("total_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
    )


# --------------------------------------------------------------------------
# heuristic language-ID from character/stopword signals, scored against
# the labeled lang column (n-gram-free heuristic: the synthetic corpus
# is ASCII; a real lang-ID swaps in char-n-gram profiles).
# --------------------------------------------------------------------------
@register(
    "txt_langid_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    pred AS (
      SELECT doc_id, lang,
             CASE WHEN avg(CASE WHEN tok IN {STOPWORDS} THEN 1.0 ELSE 0.0 END) >= 0.05
                  THEN 'en' ELSE 'other' END AS predicted_lang
      FROM toks GROUP BY doc_id, lang
    )
    SELECT lang, predicted_lang, count(*) AS n_docs
    FROM pred GROUP BY lang, predicted_lang
    """,
)
def txt_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(tokens_col()).alias("tok"))
    pred = toks.groupBy("doc_id", "lang").agg(
        F.when(
            F.avg(F.when(F.col("tok").isin(*STOPWORDS), 1.0).otherwise(0.0)) >= 0.05, "en"
        )
        .otherwise("other")
        .alias("predicted_lang")
    )
    return pred.groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n_docs"))


# --------------------------------------------------------------------------
# document fingerprinting: md5 over whitespace-normalized text.
# --------------------------------------------------------------------------
@register(
    "txt_fingerprints",
    oracle=r"""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def txt_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    normalized = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select("doc_id", F.md5(normalized).alias("fingerprint"))


# ---------------------------------------------------------------------------
# TF-IDF: the canonical corpus-weighting operator (training-data curation
# scores, keyword extraction, near-dup features). Three hash-aggregates:
# term counts per doc, doc frequency per term, corpus size — then
# tf * ln(N/df), top-5 terms per doc with deterministic tiebreaks.
#
# Scale notes: everything shuffles on (doc_id) or (tok) — both
# high-cardinality, no hot keys after the stopword-ish DF cap that
# LSH shingling also uses. No UDFs; ln() is IEEE-identical cross-engine
# on identical inputs.
# ---------------------------------------------------------------------------
@register(
    "txt_tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE doc_id < 50
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN df USING (tok) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, tok, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, tok) AS INTEGER) AS rnk
      FROM scored
    )
    SELECT doc_id, tok, tfidf, rnk FROM ranked WHERE rnk <= 5
    """,
)
def txt_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tok.select("doc_id").distinct().count()
    scored = tf.join(df, "tok").select(
        "doc_id",
        "tok",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "tok", "tfidf", "rnk")
    )
