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


# --------------------------------------------------------------------------
# Split-leakage audit: does the TEST split share n-grams with the
# TRAIN split? The measurement companion to samp_cluster_aware_split —
# the plain doc-hashed split (samp_train_val_test) CAN place two
# near-duplicates on opposite sides of the train/test fence, and this
# query quantifies exactly how much leaked: every test document
# sharing >= LEAK_MIN_OVERLAP distinct word 3-grams with some train
# document, with the worst-offender train doc per leaked test doc.
#
# Shape: one shingle relation, split map-side by the same md5 bucket
# as samp_train_val_test, joined train-vs-test on the shingle key
# (inverted index, not all-pairs). Production pre-screens with the
# Bloom gate (dd_bloom_decontaminate); this is the exact audit.
# --------------------------------------------------------------------------
LEAK_MIN_OVERLAP = 3

_LEAK_BUCKET = (
    "CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) "
    + " ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))
    + " END"
)


@register(
    "dq_split_leakage",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
      WHERE len(string_split_regex(trim(text), '\s+')) >= 3
    ),
    idx AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM tok
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      FROM idx
    ),
    lab AS (SELECT doc_id, {_LEAK_BUCKET} AS bucket FROM documents),
    train AS (
      SELECT s.doc_id AS train_id, s.sh FROM sh s
      JOIN lab l ON l.doc_id = s.doc_id WHERE l.bucket < {TRAIN_BUCKETS}
    ),
    test AS (
      SELECT s.doc_id AS test_id, s.sh FROM sh s
      JOIN lab l ON l.doc_id = s.doc_id
      WHERE l.bucket >= {TRAIN_BUCKETS + VAL_BUCKETS}
    ),
    ov AS (
      SELECT t.test_id, tr.train_id, CAST(count(*) AS BIGINT) AS overlap
      FROM test t JOIN train tr USING (sh)
      GROUP BY 1, 2
      HAVING count(*) >= {LEAK_MIN_OVERLAP}
    )
    SELECT test_id,
           CAST(count(*) AS BIGINT) AS n_train_matches,
           CAST(max(overlap) AS BIGINT) AS max_overlap,
           CAST(min(CASE WHEN overlap = mx THEN train_id END) AS BIGINT)
               AS worst_train_id
    FROM (SELECT *, max(overlap) OVER (PARTITION BY test_id) AS mx FROM ov)
    GROUP BY test_id
    """,
)
def dq_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-split documents sharing >= {LEAK_MIN_OVERLAP} distinct
    3-grams with some train-split document, with the worst offender."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sh = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3), "
                    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    labeled = sh.withColumn("bucket", bucket)
    train = labeled.filter(F.col("bucket") < TRAIN_BUCKETS).select(
        F.col("doc_id").alias("train_id"), "sh"
    )
    test = labeled.filter(F.col("bucket") >= TRAIN_BUCKETS + VAL_BUCKETS).select(
        F.col("doc_id").alias("test_id"), "sh"
    )
    ov = (
        test.join(train, "sh")
        .groupBy("test_id", "train_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
        .filter(F.col("overlap") >= LEAK_MIN_OVERLAP)
    )
    mx = ov.withColumn(
        "mx", F.max("overlap").over(W.partitionBy("test_id"))
    )
    return mx.groupBy("test_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train_matches"),
        F.max("overlap").cast("bigint").alias("max_overlap"),
        F.min(F.when(F.col("overlap") == F.col("mx"), F.col("train_id")))
        .cast("bigint")
        .alias("worst_train_id"),
    )


# --------------------------------------------------------------------------
# Dedup ROI report: what does each dedup decision actually SAVE?
# Rolls the near-dup clustering up to corpus-level economics — docs
# and tokens removed under (a) hard dedup (keep min-id survivor) and
# (b) soft dedup (token mass discounted by 1/|cluster|) — the numbers
# a curation run reports to justify its compute. Pure composition of
# the cluster relation with token counts; all counters integer.
# --------------------------------------------------------------------------
@register(
    "dd_dedup_impact",
    oracle=f"""
    WITH RECURSIVE {_CLUSTERS_CTE},
    toks AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
                 AS n_tokens
      FROM documents
    ),
    j AS (
      SELECT cl.doc_id, cl.cluster_id, cs.cluster_size, t.n_tokens,
             row_number() OVER (PARTITION BY cl.cluster_id
                                ORDER BY cl.doc_id) AS rn
      FROM clustered cl
      JOIN csize cs USING (cluster_id)
      JOIN toks t USING (doc_id)
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_removed_hard,
           CAST(sum(CASE WHEN rn > 1 THEN n_tokens ELSE 0 END) AS BIGINT)
               AS tokens_removed_hard,
           CAST(sum(n_tokens - (n_tokens * (1000000 // cluster_size))
                                // 1000000) AS BIGINT)
               AS tokens_discounted_soft
    FROM j
    """,
)
def dd_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level dedup savings: docs/tokens removed by hard
    (survivor-only) dedup and token mass discounted by soft dedup."""
    from pyspark.sql import Window as W

    cl = _clustered(spark, sf_dir)
    toks = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
    )
    j = cl.join(toks, "doc_id").withColumn(
        "rn", F.row_number().over(W.partitionBy("cluster_id").orderBy("doc_id"))
    )
    dup = F.col("rn") > 1
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("bigint").alias("docs_removed_hard"),
        F.sum(F.when(dup, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("tokens_removed_hard"),
        F.sum(
            F.col("n_tokens")
            - F.expr(
                "(n_tokens * (CAST(1000000 AS BIGINT) DIV cluster_size))"
                " DIV 1000000"
            )
        )
        .cast("bigint")
        .alias("tokens_discounted_soft"),
    )


# --------------------------------------------------------------------------
# Cross-language contamination: document pairs in DIFFERENT declared
# languages sharing >= LEAK_MIN_OVERLAP distinct 3-grams — mislabeled
# language tags, copy-paste across language slices, or code/boiler-
# plate bleeding through the langid gate. A multilingual corpus mixes
# by language; contaminated tags silently break those ratios (and
# the per-language dedup sharding). Same inverted-index shape as the
# split-leakage audit, keyed on the language fence instead.
#
# 100 TB bound (r6): candidate volume is sum(df^2) over shingles, so a
# boilerplate shingle in f docs alone costs f^2 pairs. Shingles with
# df > CROSS_LANG_DF_CAP are dropped in BOTH engines before the
# self-join — exactly the dd_ngram_jaccard_pairs DF-cap policy; a
# 3-gram shared by >1000 documents is boilerplate, not a
# contamination signal, and every surviving shingle contributes at
# most CAP^2 pairs.
# --------------------------------------------------------------------------
CROSS_LANG_DF_CAP = 1000


@register(
    "dq_cross_lang_overlap",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t
      FROM documents
      WHERE len(string_split_regex(trim(text), '\s+')) >= 3
    ),
    idx AS (
      SELECT doc_id, lang, t, unnest(generate_series(1, len(t) - 2)) AS i
      FROM tok
    ),
    sh_all AS (
      SELECT DISTINCT doc_id, lang,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      FROM idx
    ),
    sh AS (
      SELECT * FROM sh_all
      WHERE sh IN (SELECT sh FROM sh_all GROUP BY sh
                   HAVING count(*) <= {CROSS_LANG_DF_CAP})
    )
    SELECT a.doc_id AS doc_a, a.lang AS lang_a,
           b.doc_id AS doc_b, b.lang AS lang_b,
           CAST(count(*) AS BIGINT) AS overlap
    FROM sh a JOIN sh b
      ON a.sh = b.sh AND a.doc_id < b.doc_id AND a.lang <> b.lang
    GROUP BY 1, 2, 3, 4
    HAVING count(*) >= {LEAK_MIN_OVERLAP}
    """,
)
def dq_cross_lang_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of differently-tagged documents sharing >=
    {LEAK_MIN_OVERLAP} distinct 3-grams — the language-tag
    contamination audit."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    sh_all = (
        docs.select("doc_id", "lang", toks.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3), "
                    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    # DF-cap the index before the self-join (sum(df^2) bound).
    df_count = F.count(F.lit(1)).over(W.partitionBy("sh"))
    sh = (
        sh_all.withColumn("_df", df_count)
        .filter(F.col("_df") <= CROSS_LANG_DF_CAP)
        .drop("_df")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.lang") != F.col("b.lang")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.lang").alias("lang_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.lang").alias("lang_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("overlap"))
        .filter(F.col("overlap") >= LEAK_MIN_OVERLAP)
    )


# --------------------------------------------------------------------------
# Cross-source n-gram contamination matrix (round-9 shortlist #4b):
# the SOURCE-granular rollup of the leakage audits above — the table a
# data-mixing decision reads ("how much does src7 overlap src12?"),
# and the cross-SOURCE companion of dd_cross_source_matrix (which
# counts near-dup DOC pairs; this measures vocabulary-span overlap
# directly, GPT-3/PaLM-report style). 8-gram grain: long enough that
# any shared gram is a copied span, not topical vocabulary.
#
# Scale shape: the index is distinct (source, gram) — at most
# n_sources rows per gram regardless of corpus size — and the
# self-join runs on that source-deduplicated relation, so candidate
# volume is bounded by sum over grams of n_sources^2, NOT docs^2.
# The doc-level DF cap (same policy/value as CROSS_LANG_DF_CAP)
# drops boilerplate grams in both engines before source-dedup. The
# full 190-cell matrix materializes via a source cross-join (20x20
# dimension table) so silent zeros are visible rows, not absent ones.
# --------------------------------------------------------------------------
CONTAM_N = 8  # word n-gram width for span contamination
CONTAM_DF_CAP = 1000


@register(
    "dd_contamination_ngram_matrix",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
      FROM documents
      WHERE len(string_split_regex(trim(text), '\s+')) >= {CONTAM_N}
    ),
    idx AS (
      SELECT doc_id, source, t,
             unnest(generate_series(1, len(t) - {CONTAM_N - 1})) AS i
      FROM tok
    ),
    g_all AS (
      SELECT DISTINCT doc_id, source,
             {" || ' ' || ".join(f"t[i+{k}]" for k in range(CONTAM_N))} AS g
      FROM idx
    ),
    g_capped AS (
      SELECT * FROM g_all
      WHERE g IN (SELECT g FROM g_all GROUP BY g
                  HAVING count(*) <= {CONTAM_DF_CAP})
    ),
    sg AS (SELECT DISTINCT source, g FROM g_capped),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sg GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT sa.source AS source_a, sb.source AS source_b,
           coalesce(sh.n_shared, 0) AS n_shared,
           sa.n AS n_grams_a, sb.n AS n_grams_b,
           round(CAST(coalesce(sh.n_shared, 0) AS DOUBLE)
                 / least(sa.n, sb.n), 6) AS containment
    FROM sizes sa
    JOIN sizes sb ON sa.source < sb.source
    LEFT JOIN shared sh
      ON sh.source_a = sa.source AND sh.source_b = sb.source
    """,
)
def dd_contamination_ngram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct shared {CONTAM_N}-gram counts and containment for every
    source pair — the corpus-mixing contamination matrix (zeros
    materialized)."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    gram_terms = ", ".join(f"t[i+{k}]" for k in range(CONTAM_N))
    g_all = (
        docs.select("doc_id", "source", toks.alias("t"))
        .filter(F.size("t") >= CONTAM_N)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {CONTAM_N}), "
                    f"i -> concat_ws(' ', {gram_terms}))"
                )
            ).alias("g"),
        )
        .distinct()
    )
    # Round-10 optimization (guide §2.3/§2.4): ONE gram-keyed aggregate
    # replaces the window-DF pass + (source, g) distinct + gram-keyed
    # self-join — the per-gram source set is bounded by n_sources (20),
    # so doc-DF and the full source set come out of a single groupBy(g),
    # and the source PAIRS per gram (<= 190) explode from the sorted
    # set in-row (sort_array ascending == the a.source < b.source
    # string order of the join it replaces). 2 corpus-scale shuffles
    # instead of 4; identical counts by construction.
    per_g = (
        g_all.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("_df"),
            F.sort_array(F.collect_set("source")).alias("srcs"),
        )
        .filter(F.col("_df") <= CONTAM_DF_CAP)
        .select("srcs")
        # feeds sizes AND shared — two references
        .persist()
    )
    sizes = (
        per_g.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    shared = (
        per_g.select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (a, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)),"
                    " b -> named_struct('source_a', a, 'source_b', b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.source_a").alias("source_a"), F.col("p.source_b").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_grams_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_grams_b"))
    return (
        F.broadcast(sa)
        .join(F.broadcast(sb), F.col("source_a") < F.col("source_b"))
        .join(shared, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            "n_grams_a",
            "n_grams_b",
            F.round(
                F.coalesce("n_shared", F.lit(0)).cast("double")
                / F.least("n_grams_a", "n_grams_b"),
                6,
            ).alias("containment"),
        )
    )
