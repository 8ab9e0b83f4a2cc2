"""BM25 keyword retrieval over the documents corpus.

The lexical-retrieval baseline every RAG / retrieval-augmented training
pipeline runs before (or alongside) the embedding stack: Okapi BM25
with Lucene's non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``,
k1 = 1.2, b = 0.75, scored for a fixed multi-term query and reduced to
a global top-k.

Spark-first shape (100 TB corpus):
- The query-term filter lands **before** the explode aggregation, so
  the per-(doc, term) tf relation is |matching docs| x |query terms| —
  the corpus-sized token stream never shuffles (partial aggregation on
  (doc_id, tok) keys drawn from a ~|query| dictionary).
- Corpus statistics (N, avgdl, per-term df) are one-row / query-sized
  aggregates broadcast back onto the tf relation — no second corpus
  pass beyond the doc-length scan.
- The per-document term sum is spelled as FIXED-ORDER conditional-max
  columns (t0 + t1 + ...), not an order-dependent float ``sum()``, so
  the score is bit-identical across engines and partitionings (same
  policy as the MaxSim facet sum, operators/multivector.py).
- The final top-k is a TakeOrderedAndProject-shaped reduction with a
  (score desc, doc_id) total order.

No reference counterpart (the reference has no text retrieval at all);
this extends SURVEY.md §2's north-star text family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .text import tokens_col

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "vector", "stream", "dup")
BM25_TOPK = 25

_TOKENS_SQL = r"string_split_regex(trim(text), '\s+')"
_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


def _contrib_sql(i: int) -> str:
    """Per-term BM25 contribution, pivoted to a fixed column order."""
    t = BM25_TERMS[i]
    return (
        f"coalesce(max(CASE WHEN tok = '{t}' THEN "
        f"idf * tf * ({BM25_K1} + 1.0) / "
        f"(tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl)) END), 0.0)"
    )


_BM25_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents
),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_dl
  FROM dl
),
tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM docs
),
tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok
),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT t.doc_id, t.tok, t.tf, d.dl,
         CAST(c.total_dl AS DOUBLE) / c.n_docs AS avgdl,
         ln(1.0 + (c.n_docs - f.df + 0.5) / (f.df + 0.5)) AS idf
  FROM tf t
  JOIN df f USING (tok)
  JOIN dl d USING (doc_id)
  CROSS JOIN corpus c
),
per_doc AS (
  SELECT doc_id,
         {" + ".join(_contrib_sql(i) for i in range(len(BM25_TERMS)))} AS score
  FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM per_doc
)
SELECT CAST(rank AS INTEGER) AS rank, doc_id, round(score, 6) AS bm25_score
FROM ranked WHERE rank <= {BM25_TOPK}
"""


@register("txt_bm25_topk", oracle=_BM25_ORACLE)
def txt_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global BM25 top-{BM25_TOPK} for the fixed query {BM25_TERMS}."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", tokens_col().alias("toks")
    )
    dl = docs.select("doc_id", F.size("toks").cast("bigint").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
    )
    tok = docs.select("doc_id", F.explode("toks").alias("tok")).filter(
        F.col("tok").isin(*BM25_TERMS)
    )
    tf = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "tok",
            "tf",
            "dl",
            (F.col("total_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
            F.log(
                1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    contrib = (
        F.col("idf")
        * F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("tok") == t, contrib)), F.lit(0.0)
        ).alias(f"t{i}")
        for i, t in enumerate(BM25_TERMS)
    ]
    per_doc = scored.groupBy("doc_id").agg(*per_term)
    score = None
    for i in range(len(BM25_TERMS)):
        score = F.col(f"t{i}") if score is None else score + F.col(f"t{i}")
    ranked = per_doc.select("doc_id", score.alias("score")).withColumn(
        "rank", F.row_number().over(W.orderBy(F.col("score").desc(), "doc_id"))
    )
    return ranked.filter(F.col("rank") <= BM25_TOPK).select(
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("bm25_score"),
    )
