"""Dataset-split and score-calibration primitives for training corpora.

Three operators a training-data pipeline runs after cleaning/dedup:

- **Deterministic train/val/test split** (``samp_train_val_test``):
  hash-bucket assignment (md5 of the key, 16 buckets → 13/2/1 ≈
  81/12.5/6.25 %) so membership is a pure function of the document id —
  stable across engines, partitionings, reruns, and corpus growth
  (adding documents never moves an existing one between splits, unlike
  ``randomSplit``).
- **Cross-source quantile normalization** (``txt_quality_quantile_norm``):
  per-source ``percent_rank`` of a raw quality score. Raw heuristics are
  not comparable across sources (boilerplate-heavy domains score low
  everywhere); rank-normalizing within source yields one calibrated
  [0,1] scale so a single global keep-threshold is meaningful.
- **Exact heavy hitters** (``hh_frequent_tokens``): global top-K tokens
  with corpus frequency share — the vocabulary head used for stopword
  induction and tokenizer sanity checks.

Scale notes (100 TB):
- The split is a pure map-side projection — zero shuffles; the bucket
  predicate evaluates inside whole-stage codegen next to the scan.
- Quantile-norm shuffles once on ``source``; ranks never leave the
  per-source partition. At extreme per-source cardinality swap
  ``percent_rank`` for ``ntile``/approx quantile cutpoints to bound
  sort width — same output contract, bounded state.
- Heavy hitters relies on Spark's partial aggregation: the token
  explosion never shuffles raw tokens — map-side hash agg reduces each
  partition to its local vocabulary before the exchange, and the final
  top-K is TakeOrderedAndProject (no global sort). The total-token
  denominator joins in as a broadcast single row, not a
  single-partition window over the vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import table
from ._branches import explode_branches
from ..registry import register
from .text import _md5_bucket_expr_sql, tokens_col

# 16 md5 buckets: 0-12 train, 13-14 val, 15 test.
TRAIN_BUCKETS = 13
VAL_BUCKETS = 2
TOP_TOKENS = 50


@register(
    "samp_train_val_test",
    oracle=f"""
    WITH bucketed AS (
      SELECT doc_id, source, {_md5_bucket_expr_sql()} AS bucket FROM documents
    )
    SELECT doc_id, source, CAST(bucket AS INTEGER) AS bucket,
           CASE WHEN bucket < {TRAIN_BUCKETS} THEN 'train'
                WHEN bucket < {TRAIN_BUCKETS + VAL_BUCKETS} THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed
    """,
)
def samp_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 81/12.5/6.25 train/val/test assignment.

    Membership depends only on md5(doc_id), so the split survives
    reruns, engine changes, and corpus growth; no shuffle, no RNG.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10).cast("int")
    return docs.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        F.when(bucket < TRAIN_BUCKETS, "train")
        .when(bucket < TRAIN_BUCKETS + VAL_BUCKETS, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "txt_quality_quantile_norm",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, source,
             round(CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
                   / len(string_split_regex(trim(text), '\s+')), 6) AS raw_score
      FROM documents
    )
    SELECT doc_id, source, raw_score,
           round(percent_rank() OVER (
             PARTITION BY source ORDER BY raw_score, doc_id), 6) AS calibrated,
           CAST(least(floor(percent_rank() OVER (
             PARTITION BY source ORDER BY raw_score, doc_id) * 10), 9) AS INTEGER)
             AS decile
    FROM scored
    """,
)
def txt_quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rank calibration of a raw quality heuristic.

    Raw score = lexical diversity (distinct/total tokens, computed with
    array functions — no explode, no extra shuffle). ``percent_rank``
    within source, tie-broken on doc_id for a deterministic rank, plus
    the decile bucket downstream samplers key on.
    """
    docs = table(spark, sf_dir, "documents")
    toks = tokens_col()
    raw = F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6)
    w = W.partitionBy("source").orderBy("raw_score", "doc_id")
    pct = F.percent_rank().over(w)
    return docs.select("doc_id", "source", raw.alias("raw_score")).select(
        "doc_id",
        "source",
        "raw_score",
        F.round(pct, 6).alias("calibrated"),
        F.least(F.floor(pct * 10), F.lit(9)).cast("int").alias("decile"),
    )


@register(
    "hh_frequent_tokens",
    oracle=rf"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS token FROM documents
    ),
    counted AS (
      SELECT token, count(*) AS n FROM toks GROUP BY token
    ),
    total AS (SELECT sum(n) AS t FROM counted)
    SELECT token, n, round(CAST(n AS DOUBLE) / t, 6) AS share
    FROM counted, total
    ORDER BY n DESC, token
    LIMIT {TOP_TOKENS}
    """,
)
def hh_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global top-{TOP_TOKENS} tokens with corpus share.

    Map-side partial aggregation collapses each partition to its local
    vocabulary before the single hash shuffle; the grand total joins
    back as a broadcast 1-row aggregate (no single-partition window);
    the final ordering compiles to TakeOrderedAndProject.
    """
    docs = table(spark, sf_dir, "documents")
    counted = (
        docs.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counted.agg(F.sum("n").alias("t"))
    return (
        counted.crossJoin(F.broadcast(total))
        .select("token", "n", F.round(F.col("n").cast("double") / F.col("t"), 6).alias("share"))
        .orderBy(F.col("n").desc(), "token")
        .limit(TOP_TOKENS)
    )


# --------------------------------------------------------------------------
# Curation funnel: the whole corpus-curation pipeline as ONE lazy plan
# with a per-stage audit trail — docs in, after exact dedup, after
# language filter, after quality gate, after per-source quota. Each
# stage is the registered operator's logic inlined as a relation;
# the report is what a 100 TB curation run logs per snapshot (loss
# accounting per gate, token mass per stage).
# --------------------------------------------------------------------------
FUNNEL_LANGS = ("en", "es", "de")
FUNNEL_QUOTA = 40  # max docs per source after all gates


@register(
    "pipe_curation_funnel",
    oracle=f"""
    WITH s0 AS (
      SELECT doc_id, source, lang,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
               / len(string_split_regex(trim(text), '\\s+')) AS diversity,
             md5(text) AS fp
      FROM documents
    ),
    s1 AS (
      SELECT * FROM s0
      WHERE doc_id = (SELECT min(doc_id) FROM s0 i WHERE i.fp = s0.fp)
    ),
    s2 AS (SELECT * FROM s1 WHERE lang IN {FUNNEL_LANGS}),
    s3 AS (SELECT * FROM s2 WHERE n_tok >= 20 AND diversity >= 0.2),
    s4 AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        ) AS pick
        FROM s3
      ) WHERE pick <= {FUNNEL_QUOTA}
    )
    SELECT * FROM (
      SELECT 0 AS stage, 'ingest' AS gate, count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens FROM s0
      UNION ALL
      SELECT 1, 'exact_dedup', count(*), CAST(sum(n_tok) AS BIGINT) FROM s1
      UNION ALL
      SELECT 2, 'lang_filter', count(*), CAST(sum(n_tok) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'quality_gate', count(*), CAST(sum(n_tok) AS BIGINT) FROM s3
      UNION ALL
      SELECT 4, 'source_quota', count(*), CAST(sum(n_tok) AS BIGINT) FROM s4
    )
    """,
)
def pipe_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts + token mass for the curation DAG.

    One lazy plan: dedup keep-first (window on the content hash), the
    language allowlist, the quality gate (token count + lexical
    diversity), and the md5-ordered per-source quota, each feeding the
    next; the five stage counts union into the audit report. Every
    stage is the same logic as its standalone registered operator.
    """
    docs = table(spark, sf_dir, "documents")
    toks = tokens_col()
    s0 = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(toks).cast("bigint").alias("n_tok"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "diversity"
        ),
        F.md5("text").alias("fp"),
    )
    # SINGLE PASS: per-row survivor flags for every stage, then one
    # conditional aggregate fanned out per stage. A union of per-stage
    # aggs re-executes the shared chain per branch (the dedup window
    # alone would run 4x). `pick` = running count of quality survivors
    # in the same (md5, doc_id) order the standalone quota operator
    # uses — identical to row_number over the filtered relation because
    # the ordering key is unique (explicit ROWS frame, no RANGE peers).
    keep_w = W.partitionBy("fp").orderBy("doc_id")
    quota_w = (
        W.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is1 = F.col("_rn") == 1
    is2 = is1 & F.col("lang").isin(*FUNNEL_LANGS)
    is3 = is2 & (F.col("n_tok") >= 20) & (F.col("diversity") >= 0.2)
    flagged = (
        s0.withColumn("_rn", F.row_number().over(keep_w))
        .withColumn("_s3", is3.cast("int"))
        .withColumn("pick", F.sum("_s3").over(quota_w))
        .select(
            "n_tok",
            is1.alias("_is1"),
            is2.alias("_is2"),
            F.col("_s3").cast("boolean").alias("_is3"),
            (
                (F.col("_s3") == 1) & (F.col("pick") <= FUNNEL_QUOTA)
            ).alias("_is4"),
        )
    )
    gates = [
        (0, "ingest", F.lit(True)),
        (1, "exact_dedup", F.col("_is1")),
        (2, "lang_filter", F.col("_is2")),
        (3, "quality_gate", F.col("_is3")),
        (4, "source_quota", F.col("_is4")),
    ]
    aggs = []
    for i, gate, cond in gates:
        aggs.append(F.sum(cond.cast("int")).alias(f"n_{i}"))
        aggs.append(
            F.sum(F.when(cond, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias(f"t_{i}")
        )
    cells = flagged.agg(*aggs)
    return explode_branches(
        cells,
        [
            F.struct(
                F.lit(i).alias("stage"),
                F.lit(gate).alias("gate"),
                F.col(f"n_{i}").alias("n_docs"),
                F.col(f"t_{i}").alias("n_tokens"),
            )
            for i, gate, _ in gates
        ],
    )


# --------------------------------------------------------------------------
# Neyman-allocated stratified sample: when building a fixed-size eval
# set over heterogeneous strata, proportional allocation wastes budget
# on low-variance strata — Neyman allocation sizes each stratum by
# N_h * S_h (population x std-dev), minimizing the variance of the
# estimated mean for a fixed total budget. The principled version of
# the flat per-source quota (samp_docs_source_quota).
#
# Determinism: S_h comes from DECIMAL(38,0) sums of integer cents
# (exact under any shuffle order); the 5 stratum weights combine in a
# FIXED ORDER (pivoted columns, the BM25/MaxSim policy) so the shared
# denominator is bit-identical; allocations are floor(x + 0.5) of
# scalar doubles; membership is md5-rank order within stratum. The
# selection itself is value-checked via the BIGINT sum of selected
# order keys.
# --------------------------------------------------------------------------
NEYMAN_BUDGET = 500
_STRATA = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _neyman_w_sql(p: str) -> str:
    return f"max(CASE WHEN priority = '{p}' THEN w END)"


@register(
    "samp_neyman_allocation",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    st AS (
      SELECT priority,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(cents AS DECIMAL(38,0))) AS sx,
             sum(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
                 AS sxx
      FROM base GROUP BY priority
    ),
    sd AS (
      SELECT priority, n,
             sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1))) / 100.0 AS s_h
      FROM st
    ),
    w AS (SELECT priority, n, s_h, n * s_h AS w FROM sd),
    tot AS (
      SELECT {" + ".join(_neyman_w_sql(p) for p in _STRATA)} AS total_w FROM w
    ),
    alloc AS (
      SELECT w.priority, w.n, w.s_h,
             CAST(floor({NEYMAN_BUDGET} * w.w / t.total_w + 0.5) AS INTEGER)
                 AS alloc
      FROM w CROSS JOIN tot t
    ),
    ranked AS (
      SELECT b.o_orderkey, b.priority,
             row_number() OVER (PARTITION BY b.priority
                                ORDER BY md5(CAST(b.o_orderkey AS VARCHAR)),
                                         b.o_orderkey) AS rnk
      FROM base b
    ),
    sel AS (
      SELECT r.priority, r.o_orderkey
      FROM ranked r JOIN alloc a ON a.priority = r.priority
      WHERE r.rnk <= a.alloc
    )
    SELECT a.priority, a.n AS n_pop, round(a.s_h, 6) AS sd_value, a.alloc,
           CAST(count(s.o_orderkey) AS BIGINT) AS n_selected,
           CAST(coalesce(sum(s.o_orderkey), 0) AS BIGINT) AS sample_key_sum
    FROM alloc a LEFT JOIN sel s ON s.priority = a.priority
    GROUP BY a.priority, a.n, a.s_h, a.alloc
    """,
)
def samp_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocated {NEYMAN_BUDGET}-order stratified sample by
    priority: per-stratum sd from exact DECIMAL sums, fixed-order
    weight total, md5-rank membership, selection checksummed."""
    from pyspark.sql import Window as W

    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    st = base.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents").cast("decimal(38,0)")
        ).alias("sxx"),
    )
    n = F.col("n")
    s_h = (
        F.sqrt(
            (n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
            / (n.cast("double") * (n - 1))
        )
        / 100.0
    )
    # strata-sized (5 rows) and referenced by the weight total AND the
    # allocation — persist so the orders stats pass runs once.
    w = st.select("priority", "n", s_h.alias("s_h")).withColumn(
        "w", F.col("n") * F.col("s_h")
    ).persist()
    tot = w.agg(
        *[
            F.max(F.when(F.col("priority") == p, F.col("w"))).alias(f"w{i}")
            for i, p in enumerate(_STRATA)
        ]
    )
    total = None
    for i in range(len(_STRATA)):
        total = F.col(f"w{i}") if total is None else total + F.col(f"w{i}")
    alloc = w.crossJoin(F.broadcast(tot.select(total.alias("total_w")))).select(
        "priority",
        "n",
        "s_h",
        F.floor(NEYMAN_BUDGET * F.col("w") / F.col("total_w") + 0.5)
        .cast("int")
        .alias("alloc"),
    )
    ranked = base.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("priority").orderBy(
                F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
            )
        ),
    )
    sel = ranked.join(F.broadcast(alloc.select("priority", "alloc")), "priority").filter(
        F.col("rnk") <= F.col("alloc")
    )
    summary = sel.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.sum("o_orderkey").cast("bigint").alias("sample_key_sum"),
    )
    return (
        alloc.join(summary, "priority", "left")
        .select(
            "priority",
            F.col("n").alias("n_pop"),
            F.round("s_h", 6).alias("sd_value"),
            "alloc",
            F.coalesce("n_selected", F.lit(0)).cast("bigint").alias("n_selected"),
            F.coalesce("sample_key_sum", F.lit(0)).cast("bigint").alias("sample_key_sum"),
        )
    )


# --------------------------------------------------------------------------
# K-fold cross-validation assignment: fold = md5 bucket % K, so folds
# are stable under corpus growth and identical across engines/reruns
# (the samp_train_val_test policy extended to CV). Emitted with
# per-fold counts so imbalance is visible at assignment time.
# --------------------------------------------------------------------------
KFOLD_K = 5


@register(
    "samp_kfold_assign",
    oracle=f"""
    WITH bucketed AS (
      SELECT doc_id, source, ({_md5_bucket_expr_sql()}) % {KFOLD_K} AS fold
      FROM documents
    )
    SELECT doc_id, source, CAST(fold AS INTEGER) AS fold,
           CAST(count(*) OVER (PARTITION BY fold) AS BIGINT) AS fold_size
    FROM bucketed
    """,
)
def samp_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {KFOLD_K}-fold CV assignment with fold sizes."""
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
        .cast("int")
        % KFOLD_K
    )
    out = docs.withColumn("fold", fold)
    return out.withColumn(
        "fold_size",
        F.count(F.lit(1)).over(W.partitionBy("fold")).cast("bigint"),
    )


# --------------------------------------------------------------------------
# Mixing-budget waterfill: allocate a token budget across sources
# toward equal shares, respecting per-source supply — the allocation
# step of data mixing (temperature resampling decides the TARGET
# ratios; this decides what is actually TAKEN when some sources can't
# fill their share). Two explicit waterfill rounds in exact BIGINT
# arithmetic: round 1 gives each source min(supply, budget/K); round 2
# redistributes the leftover equally among sources with remaining
# capacity. Remaining budget after round 2 is reported, not silently
# dropped (the no-silent-caps policy).
#
# Scale: everything after the per-source token sums (one partial-agg
# pass) is dimension-sized arithmetic.
# --------------------------------------------------------------------------
WF_BUDGET_FRACTION_DEN = 2  # budget = total_tokens / 2


@register(
    "samp_mix_waterfill",
    oracle=rf"""
    WITH supply AS (
      SELECT source,
             CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                 AS supply_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(supply_tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS k
      FROM supply
    ),
    r1 AS (
      SELECT s.source, s.supply_tokens,
             (t.total // {WF_BUDGET_FRACTION_DEN}) // t.k AS target,
             least(s.supply_tokens, (t.total // {WF_BUDGET_FRACTION_DEN}) // t.k)
                 AS a1
      FROM supply s CROSS JOIN tot t
    ),
    l1 AS (
      SELECT (t.total // {WF_BUDGET_FRACTION_DEN}) - sum(r1.a1) AS leftover,
             sum(CASE WHEN r1.a1 < r1.supply_tokens THEN 1 ELSE 0 END) AS n_unex
      FROM r1 CROSS JOIN tot t
      GROUP BY t.total
    ),
    r2 AS (
      SELECT r1.source, r1.supply_tokens, r1.target,
             CASE WHEN r1.a1 < r1.supply_tokens AND l1.n_unex > 0
                  THEN least(r1.supply_tokens,
                             r1.a1 + l1.leftover // l1.n_unex)
                  ELSE r1.a1 END AS alloc
      FROM r1 CROSS JOIN l1
    )
    SELECT source, supply_tokens, CAST(target AS BIGINT) AS target_tokens,
           CAST(alloc AS BIGINT) AS alloc_tokens,
           (alloc >= supply_tokens) AS exhausted
    FROM r2
    """,
)
def samp_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round integer waterfill of a token budget (= total/2)
    toward equal per-source shares, bounded by per-source supply."""
    docs = table(spark, sf_dir, "documents")
    # sources-sized and referenced twice (total + round 1) — persist so
    # the corpus token count runs once; r1 likewise feeds the leftover
    # aggregate AND round 2.
    supply = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("bigint")
        .alias("supply_tokens")
    ).persist()
    tot = supply.agg(
        F.sum("supply_tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    r1 = supply.crossJoin(F.broadcast(tot)).select(
        "source",
        "supply_tokens",
        F.expr(f"(total DIV {WF_BUDGET_FRACTION_DEN}) DIV k").alias("target"),
        F.least(
            F.col("supply_tokens"),
            F.expr(f"(total DIV {WF_BUDGET_FRACTION_DEN}) DIV k"),
        ).alias("a1"),
        F.expr(f"total DIV {WF_BUDGET_FRACTION_DEN}").alias("budget"),
    ).persist()
    l1 = r1.agg(
        (F.max("budget") - F.sum("a1")).alias("leftover"),
        F.sum(F.when(F.col("a1") < F.col("supply_tokens"), 1).otherwise(0)).alias(
            "n_unex"
        ),
    )
    r2 = r1.crossJoin(F.broadcast(l1)).select(
        "source",
        "supply_tokens",
        "target",
        F.when(
            (F.col("a1") < F.col("supply_tokens")) & (F.col("n_unex") > 0),
            F.least(
                F.col("supply_tokens"),
                F.col("a1") + F.expr("leftover DIV n_unex"),
            ),
        )
        .otherwise(F.col("a1"))
        .alias("alloc"),
    )
    return r2.select(
        "source",
        "supply_tokens",
        F.col("target").cast("bigint").alias("target_tokens"),
        F.col("alloc").cast("bigint").alias("alloc_tokens"),
        (F.col("alloc") >= F.col("supply_tokens")).alias("exhausted"),
    )


# --------------------------------------------------------------------------
# Distribution-matched sampling — draw a fixed-size sample from the
# WHOLE corpus whose length distribution matches a TARGET slice's (here
# the English docs): the domain-adaptation sampler ("make the mix look
# like the target domain") that quota sampling can't express because
# its quotas are data-derived, not given. Bins are the target's exact
# length quartiles (global_quantiles_cont — bit-exact vs DuckDB's
# quantile_cont, pinned in tests/test_ranking_helpers.py); per-bin
# quotas are integer-exact floor(N * target_share); within-bin
# selection is md5-ranked so membership is a pure function of the data.
#
# Scale: quartile edges come from the range-partitioned quantile
# helper; binning is a map-side projection; the within-bin rank
# partitions on the 4 bins — at 100 TB swap it for the global_rank
# helper applied per bin (same range-partition trick, same contract)
# or salt the rank key; the quota filter then behaves identically.
# --------------------------------------------------------------------------
MATCH_SAMPLE_N = 200
MATCH_TARGET_LANG = "en"


@register(
    "samp_length_matched",
    oracle=f"""
    WITH target AS (
      SELECT n_chars FROM documents WHERE lang = '{MATCH_TARGET_LANG}'
    ),
    edges AS (
      SELECT quantile_cont(n_chars, 0.25) AS q1,
             quantile_cont(n_chars, 0.50) AS q2,
             quantile_cont(n_chars, 0.75) AS q3,
             CAST(count(*) AS BIGINT) AS nt
      FROM target
    ),
    tbin AS (
      SELECT 1 + CAST(t.n_chars > e.q1 AS INTEGER)
               + CAST(t.n_chars > e.q2 AS INTEGER)
               + CAST(t.n_chars > e.q3 AS INTEGER) AS bin
      FROM target t CROSS JOIN edges e
    ),
    quota AS (
      SELECT bin, CAST(({MATCH_SAMPLE_N} * count(*)) // max(e.nt) AS BIGINT)
                 AS n_b
      FROM tbin CROSS JOIN edges e GROUP BY bin
    ),
    cbin AS (
      SELECT d.doc_id, d.n_chars,
             1 + CAST(d.n_chars > e.q1 AS INTEGER)
               + CAST(d.n_chars > e.q2 AS INTEGER)
               + CAST(d.n_chars > e.q3 AS INTEGER) AS bin
      FROM documents d CROSS JOIN edges e
    ),
    ranked AS (
      SELECT doc_id, n_chars, bin,
             row_number() OVER (PARTITION BY bin
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                 AS rn
      FROM cbin
    )
    SELECT r.doc_id, CAST(r.bin AS INTEGER) AS bin, r.n_chars
    FROM ranked r JOIN quota q USING (bin)
    WHERE r.rn <= q.n_b
    """,
)
def samp_length_matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{MATCH_SAMPLE_N}-doc corpus sample whose length-quartile mix
    matches the '{MATCH_TARGET_LANG}' slice (md5-deterministic
    within-bin selection)."""
    from ..functions.ranking import global_quantiles_cont

    docs = table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == MATCH_TARGET_LANG)
    edges = global_quantiles_cont(
        target, F.col("n_chars").cast("double"),
        {"q1": 0.25, "q2": 0.50, "q3": 0.75}, n_col="nt",
    )

    def binned(df: DataFrame) -> DataFrame:
        return df.crossJoin(F.broadcast(edges)).withColumn(
            "bin",
            (
                F.lit(1)
                + (F.col("n_chars") > F.col("q1")).cast("int")
                + (F.col("n_chars") > F.col("q2")).cast("int")
                + (F.col("n_chars") > F.col("q3")).cast("int")
            ),
        )
    quota = (
        binned(target.select("n_chars"))
        .groupBy("bin")
        .agg(
            F.expr(f"CAST(({MATCH_SAMPLE_N} * count(1)) DIV max(nt) AS BIGINT)")
            .alias("n_b")
        )
    )
    ranked = binned(docs.select("doc_id", "n_chars")).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("bin").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        ),
    )
    return (
        ranked.join(F.broadcast(quota), "bin")
        .filter(F.col("rn") <= F.col("n_b"))
        .select("doc_id", F.col("bin").cast("int").alias("bin"), "n_chars")
    )
