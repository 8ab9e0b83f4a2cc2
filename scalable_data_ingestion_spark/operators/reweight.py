"""DSIR-style hashed n-gram importance reweighting.

Data Selection via Importance Resampling [Xie et al., NeurIPS '23]
scores every raw-corpus document by how target-like its hashed n-gram
distribution is: features are token hash buckets, a bag-of-buckets
unigram model is fit to the target set and to the raw corpus, and each
document gets the log importance weight

    log w(doc) = sum over tokens t of  log p_target(b(t)) - log p_raw(b(t))

Documents with positive weight look more like the target than the raw
corpus; resampling proportional to w concentrates training data on the
target distribution without a learned classifier.

Here the "target" is the English slice (``lang = 'en'``) and the raw
corpus is all documents — the same shape as using a trusted high-
quality corpus as the target at production scale.

Spark-first shape and why it scales to 100 TB:
- Features are md5 hash buckets (first 2 hex chars -> 256 buckets), so
  the "vocabulary" is fixed-size regardless of corpus size. The two
  bucket language models are ONE groupBy over the exploded tokens
  (conditional sums fit both models in the same pass), produce exactly
  256 rows, and join back as a broadcast — no second scan, no skew.
- Per-document aggregation happens on (doc, bucket) counts first, so
  the weight join processes at most 256 rows per document instead of
  one row per token.
- Laplace smoothing (+1 / +256) keeps every bucket weight finite, so
  the expression never branches on empty buckets.

Determinism: bucket ids are md5 hex prefixes (identical in DuckDB),
counts are exact integers, and each bucket's log-ratio is computed
from identical double divisions in both engines; the per-doc result is
rounded to 6 dp before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

DSIR_BUCKETS = 256  # 2 hex chars of md5(token)
DSIR_TARGET_LANG = "en"

_DSIR_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
),
b AS (
  SELECT doc_id, lang, substr(md5(w), 1, 2) AS bk FROM tok
),
bc AS (
  SELECT bk, count(*) AS n_raw,
         sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS n_tgt
  FROM b GROUP BY bk
),
tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM bc),
lw AS (
  SELECT bk,
         ln((n_tgt + 1.0) / (t_tgt + {DSIR_BUCKETS}.0))
           - ln((n_raw + 1.0) / (t_raw + {DSIR_BUCKETS}.0)) AS w
  FROM bc CROSS JOIN tot
),
doc_b AS (SELECT doc_id, bk, count(*) AS k FROM b GROUP BY doc_id, bk)
SELECT d.doc_id,
       CAST(sum(d.k) AS BIGINT) AS n_tokens,
       round(sum(d.k * lw.w), 6) AS log_weight,
       (sum(d.k * lw.w) > 0) AS target_like
FROM doc_b d JOIN lw ON d.bk = lw.bk
GROUP BY d.doc_id
"""


@register("samp_dsir_weights", oracle=_DSIR_SQL)
def samp_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-unigram DSIR log importance weights vs the English slice.

    Plan: one explode+groupBy fits both 256-bucket language models in a
    single pass; the tiny weight table broadcasts back onto per-(doc,
    bucket) counts. Two shuffles total, both with map-side combine."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
    b = docs.select("doc_id", "lang", toks).select(
        "doc_id", "lang", F.substring(F.md5("w"), 1, 2).alias("bk")
    )
    # (doc, bucket) token counts — the single tokenization pass. Cached
    # because both the bucket language models and the per-doc weights
    # derive from it (a production pipeline persists this feature table;
    # without the cache Catalyst would re-tokenize the corpus per use).
    doc_b = (
        b.groupBy("doc_id", "lang", "bk").agg(F.count(F.lit(1)).alias("k")).cache()
    )
    bc = doc_b.groupBy("bk").agg(
        F.sum("k").alias("n_raw"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("k")).otherwise(F.lit(0))
        ).alias("n_tgt"),
    )
    tot = bc.agg(
        F.sum("n_raw").alias("t_raw"), F.sum("n_tgt").alias("t_tgt")
    )
    lw = (
        bc.crossJoin(F.broadcast(tot))
        .select(
            "bk",
            (
                F.log((F.col("n_tgt") + 1.0) / (F.col("t_tgt") + float(DSIR_BUCKETS)))
                - F.log((F.col("n_raw") + 1.0) / (F.col("t_raw") + float(DSIR_BUCKETS)))
            ).alias("w"),
        )
    )
    contrib = F.col("k") * F.col("w")
    return (
        doc_b.join(F.broadcast(lw), "bk")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_tokens"),
            F.round(F.sum(contrib), 6).alias("log_weight"),
            (F.sum(contrib) > 0).alias("target_like"),
        )
    )


# --------------------------------------------------------------------------
# DSIR stage 2: importance *resampling* via deterministic Gumbel-top-k.
#
# Sampling k documents without replacement with probability
# proportional to exp(log_weight) is exactly "perturb-and-take-top-k"
# [Vieira '14; Kool et al., ICML '19]: add independent Gumbel(0,1)
# noise to each log-weight and keep the k largest. The Gumbel draw
# here is a *hash-derived* uniform (first 6 hex chars of
# md5(doc_id) -> u in (0,1), g = -ln(-ln u)) so the sample is a pure
# function of the data — reproducible across engines, partitionings,
# and reruns, the same policy as every md5-bucketed sampler in
# operators/text.py.
#
# Scale: the noisy key is a map-side expression; top-k is a single
# TakeOrderedAndProject-shaped reduction (per-partition heaps, no
# global sort of the corpus).
# --------------------------------------------------------------------------
DSIR_SAMPLE_K = 100
_HEX6_DEN = 16**6 + 1  # u = (hex6 + 1) / (16^6 + 1)  in (0, 1)


def _duck_hex6(expr: str) -> str:
    """DuckDB: first 6 hex chars of md5(expr) as an integer (no conv()
    in DuckDB; unrolled per-nibble CASE, same trick as
    operators/text.py _md5_bucket_expr_sql)."""
    nib = "0123456789abcdef"
    parts = []
    for p in range(6):
        case = (
            f"(CASE substr(md5({expr}), {p + 1}, 1) "
            + " ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate(nib))
            + " END)"
        )
        parts.append(f"{case} * {16 ** (5 - p)}")
    return "(" + " + ".join(parts) + ")"


_GUMBEL_SQL = f"""
WITH dsir AS ({_DSIR_SQL.strip()}),
keyed AS (
  SELECT doc_id, n_tokens, log_weight,
         log_weight + (- ln(- ln((({_duck_hex6("CAST(doc_id AS VARCHAR)")}) + 1.0)
                                  / {_HEX6_DEN}.0))) AS gumbel_key
  FROM dsir
),
ranked AS (
  SELECT doc_id, n_tokens, log_weight, gumbel_key,
         row_number() OVER (ORDER BY gumbel_key DESC, doc_id) AS rank
  FROM keyed
)
SELECT CAST(rank AS INTEGER) AS rank, doc_id, n_tokens,
       log_weight, round(gumbel_key, 6) AS gumbel_key
FROM ranked WHERE rank <= {DSIR_SAMPLE_K}
"""


@register("samp_dsir_gumbel_topk", oracle=_GUMBEL_SQL)
def samp_dsir_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-resample DSIR_SAMPLE_K docs ~ exp(log_weight) without
    replacement, via hash-deterministic Gumbel perturbation + top-k.

    The top-k is TakeOrderedAndProject (per-partition heaps), never a
    single-partition ranking of the whole corpus; only the K survivors
    see a window (VERDICT r3 #3)."""
    from ..functions.ranking import take_ordered_ranked

    weights = samp_dsir_weights(spark, sf_dir)
    hex6 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("bigint")
    u = (hex6 + F.lit(1).cast("double")) / F.lit(float(_HEX6_DEN))
    keyed = weights.withColumn(
        "gumbel_key", F.col("log_weight") + (-F.log(-F.log(u)))
    )
    ranked = take_ordered_ranked(
        keyed, [F.col("gumbel_key").desc(), F.col("doc_id")], DSIR_SAMPLE_K
    )
    return ranked.select(
        F.col("rank").cast("int").alias("rank"),
        "doc_id",
        "n_tokens",
        "log_weight",
        F.round("gumbel_key", 6).alias("gumbel_key"),
    )
