"""Cluster-aware curation: soft-dedup weights and leakage-free splits.

Two techniques that consume the near-dup components
(operators/dedup.py dd_neardup_components) instead of hard-dropping
duplicates:

- **Soft dedup** (``dd_softdedup_weights``): keep every copy but give
  each document training weight 1/|cluster| so a cluster contributes
  one document's worth of gradient regardless of how many times it was
  crawled. The downweight-not-drop alternative used when duplicates
  carry distribution signal (popular pages SHOULD be seen — once).
  Weights are integer micro-units (1e6 DIV size), so any downstream
  weighted aggregation stays exact (the attribution-credit policy).
- **Cluster-aware split** (``samp_cluster_aware_split``): train/val/
  test assignment hashed on the CLUSTER id, not the document id — all
  near-duplicates of a document land in the same split, so the test
  set cannot contain a near-copy of a training document (the
  dedup-aware split hygiene the plain samp_train_val_test cannot
  provide; same 13/2/1 md5-bucket ratios so the two splits are
  directly comparable).

Singleton documents (no near-dup edges) form their own cluster
(cluster_id = doc_id, size 1) via a LEFT JOIN of the corpus onto the
component labels.

Scale: both operators add one broadcast-sized join (component labels
are |near-dup docs| rows, far smaller than the corpus) and a map-side
projection on top of the component computation's own cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .dedup import _SHINGLES_CTE, JACCARD_THRESHOLD, dd_neardup_components
from .splits import TRAIN_BUCKETS, VAL_BUCKETS

# Recursive-CTE component labels left-joined onto the full corpus;
# singletons keep their own id. Shared by both oracles below.
_CLUSTERS_CTE = f"""
{_SHINGLES_CTE},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shingle a JOIN shingle b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
prs AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM prs
  UNION ALL
  SELECT doc_b, doc_a FROM prs
),
gnodes AS (SELECT DISTINCT a AS doc_id FROM edges),
walk(doc_id, lab) AS (
  SELECT doc_id, doc_id FROM gnodes
  UNION
  SELECT e.b, w.lab FROM walk w JOIN edges e ON e.a = w.doc_id
  WHERE w.lab < e.b
),
comp AS (SELECT doc_id, min(lab) AS component_id FROM walk GROUP BY doc_id),
clustered AS (
  SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
),
csize AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM clustered GROUP BY cluster_id
)
"""


def _clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) over the FULL corpus."""
    comp = dd_neardup_components(spark, sf_dir).select("doc_id", "component_id")
    docs = table(spark, sf_dir, "documents").select("doc_id")
    clustered = docs.join(F.broadcast(comp), "doc_id", "left").select(
        "doc_id", F.coalesce("component_id", "doc_id").alias("cluster_id")
    )
    csize = clustered.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return clustered.join(F.broadcast(csize), "cluster_id")


@register(
    "dd_softdedup_weights",
    oracle=f"""
    WITH RECURSIVE {_CLUSTERS_CTE}
    SELECT cl.doc_id, cl.cluster_id, cs.cluster_size,
           1000000 // cs.cluster_size AS weight_micro,
           round((1000000 // cs.cluster_size) / 1000000.0, 6) AS weight
    FROM clustered cl JOIN csize cs USING (cluster_id)
    """,
)
def dd_softdedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 1/|near-dup cluster| training weight in exact
    integer micro-units (singletons weigh 1.0)."""
    cl = _clustered(spark, sf_dir)
    micro = F.expr("CAST(1000000 AS BIGINT) DIV cluster_size")
    return cl.select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        micro.alias("weight_micro"),
        F.round(micro / F.lit(1000000.0), 6).alias("weight"),
    )


_BUCKET_SQL = (
    "CASE substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1) "
    + " ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))
    + " END"
)


@register(
    "samp_cluster_aware_split",
    oracle=f"""
    WITH RECURSIVE {_CLUSTERS_CTE},
    bucketed AS (
      SELECT doc_id, cluster_id, {_BUCKET_SQL} AS bucket FROM clustered
    )
    SELECT doc_id, cluster_id,
           CASE WHEN bucket < {TRAIN_BUCKETS} THEN 'train'
                WHEN bucket < {TRAIN_BUCKETS + VAL_BUCKETS} THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed
    """,
)
def samp_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split hashed on the near-dup CLUSTER id — no
    test document has a near-duplicate in train (t: pytest asserts
    split is constant within every cluster)."""
    cl = _clustered(spark, sf_dir)
    bucket = F.conv(
        F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    return cl.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < TRAIN_BUCKETS, "train")
        .when(bucket < TRAIN_BUCKETS + VAL_BUCKETS, "val")
        .otherwise("test")
        .alias("split"),
    )


# --------------------------------------------------------------------------
# Quality-aware survivorship: instead of keeping the min-id document
# per near-dup cluster (dd_neardup_survivors), keep the HIGHEST
# QUALITY copy — crawls of the same page differ (truncation, boiler-
# plate, encoding damage) and the min-id policy throws that signal
# away. Quality = the lexical-diversity score (operators/text.py), in
# 1e-6 fixed point so both engines rank identically; ties break to
# the lower doc_id.
# --------------------------------------------------------------------------
_QUALITY_CTE = r"""
qtoks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
),
quality AS (
  SELECT doc_id,
         CAST(floor(CAST(count(DISTINCT tok) AS DOUBLE) / count(*) * 1000000
                    + 0.5) AS BIGINT) AS qfx
  FROM qtoks GROUP BY doc_id
)
"""


@register(
    "dd_quality_survivors",
    oracle=f"""
    WITH RECURSIVE {_CLUSTERS_CTE},
    {_QUALITY_CTE.strip().rstrip()},
    ranked AS (
      SELECT cl.doc_id, cl.cluster_id, q.qfx,
             row_number() OVER (PARTITION BY cl.cluster_id
                                ORDER BY q.qfx DESC, cl.doc_id) AS rn
      FROM clustered cl JOIN quality q USING (doc_id)
    )
    SELECT doc_id, cluster_id,
           round(qfx / 1000000.0, 6) AS quality,
           (rn = 1) AS keep
    FROM ranked
    """,
)
def dd_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster, keep the copy with the highest lexical
    diversity (fixed-point, doc_id tiebreak)."""
    from pyspark.sql import Window as W

    from .text import tokens_col

    cl = _clustered(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    quality = toks.groupBy("doc_id").agg(
        F.floor(
            F.countDistinct("tok").cast("double")
            / F.count(F.lit(1))
            * 1000000
            + 0.5
        )
        .cast("bigint")
        .alias("qfx")
    )
    ranked = cl.join(quality, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("cluster_id").orderBy(F.col("qfx").desc(), "doc_id")
        ),
    )
    return ranked.select(
        "doc_id",
        "cluster_id",
        F.round(F.col("qfx") / 1000000.0, 6).alias("quality"),
        (F.col("rn") == 1).alias("keep"),
    )
