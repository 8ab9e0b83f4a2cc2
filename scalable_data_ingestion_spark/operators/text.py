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


# --------------------------------------------------------------------------
# Benchmark decontamination: flag corpus documents that share word
# 3-grams with a held-out eval set (the classic pre-training hygiene
# step — exact n-gram overlap against benchmark text).
# --------------------------------------------------------------------------
DECON_BENCH_MOD = 50  # doc_id % MOD == 0 plays the benchmark set
DECON_MIN_OVERLAP = 3  # >= this many shared distinct 3-grams => contaminated


@register(
    "txt_decontamination",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 3
    ),
    idx AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM tok
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh FROM idx
    ),
    bench AS (
      SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % {DECON_BENCH_MOD} = 0
    ),
    bsizes AS (SELECT bench_id, count(*) AS bn FROM bench GROUP BY bench_id),
    corpus AS (SELECT doc_id, sh FROM sh WHERE doc_id % {DECON_BENCH_MOD} <> 0),
    ov AS (
      SELECT c.doc_id, b.bench_id, count(*) AS overlap
      FROM corpus c JOIN bench b USING (sh)
      GROUP BY 1, 2
    )
    SELECT ov.doc_id, ov.bench_id, CAST(overlap AS BIGINT) AS overlap,
           round(CAST(overlap AS DOUBLE) / bn, 6) AS bench_frac
    FROM ov JOIN bsizes USING (bench_id)
    WHERE overlap >= {DECON_MIN_OVERLAP}
    ORDER BY doc_id, bench_id
    """,
)
def txt_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram decontamination of the corpus against an eval set.

    Documents with ``doc_id % 50 == 0`` stand in for the benchmark;
    every other document is scored by how many distinct word 3-grams it
    shares with each benchmark doc, plus the fraction of that
    benchmark's shingles covered. At 100 TB the benchmark side is tiny
    and static, so its shingle set broadcasts: the corpus side streams
    map-side through a broadcast-hash join and the only shuffle is the
    per-(doc, bench) overlap count — no corpus self-join anywhere.
    """
    docs = table(spark, sf_dir, "documents")
    toks = tokens_col()
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
    bench = sh.filter(F.col("doc_id") % DECON_BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "sh"
    )
    bsizes = bench.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bn"))
    corpus = sh.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
    ov = (
        corpus.join(F.broadcast(bench), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        ov.filter(F.col("overlap") >= DECON_MIN_OVERLAP)
        .join(F.broadcast(bsizes), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            "overlap",
            F.round(F.col("overlap").cast("double") / F.col("bn"), 6).alias("bench_frac"),
        )
        .orderBy("doc_id", "bench_id")
    )


# --------------------------------------------------------------------------
# Per-source quota sampling: cap each source at K documents, selected
# by deterministic hash order (corpus-curation primitive: bounds any
# one domain's contribution to the training mix).
# --------------------------------------------------------------------------
QUOTA_PER_SOURCE = 10


@register(
    "samp_docs_source_quota",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS INTEGER) AS pick
      FROM documents
    )
    SELECT doc_id, source, pick FROM ranked WHERE pick <= {QUOTA_PER_SOURCE}
    ORDER BY source, pick
    """,
)
def samp_docs_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most K docs per source, chosen by md5(doc_id) order.

    The hash order makes the sample deterministic across engines,
    re-runs, and partitionings (unlike rand(seed), which is
    partition-layout dependent). One shuffle on ``source``; at scale,
    skewed sources are bounded by the quota itself — the window only
    needs the first K rows per partition key (Spark runs a rank-limit
    pushdown under AQE; a two-stage per-partition pre-top-K is the
    manual variant if a single source dominates a partition).
    """
    docs = table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        docs.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= QUOTA_PER_SOURCE)
        .select("doc_id", "source", "pick")
        .orderBy("source", "pick")
    )


# --------------------------------------------------------------------------
# Greedy token-window packing: assign docs (in doc_id order, per
# source) to fixed-budget token windows — the sequence-packing step
# that turns a curated corpus into training batches.
# --------------------------------------------------------------------------
PACK_BUDGET = 256  # tokens per packed window


@register(
    "pack_token_windows",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum_tok
      FROM tok
    )
    SELECT doc_id, source, n_tok,
           CAST(floor((cum_tok - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS window_id,
           CAST(cum_tok - n_tok AS BIGINT) AS offset_tok
    FROM cum
    ORDER BY source, doc_id
    """,
)
def pack_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit packing of documents into fixed token budgets.

    Window id is floor(running-token-offset / budget) per source in
    doc_id order — deterministic, no driver loop, one shuffle on
    ``source``. At 100 TB the running sum is the only sequential
    dependency, and it parallelizes per source (for a single giant
    source, pre-bucket by doc_id range and offset each bucket by the
    previous buckets' token totals — a 2-pass prefix-sum).
    """
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(tokens_col()).cast("bigint")
    w = W.partitionBy("source").orderBy("doc_id")
    cum = docs.select("doc_id", "source", n_tok.alias("n_tok")).withColumn(
        "cum_tok", F.sum("n_tok").over(w)
    )
    off = F.col("cum_tok") - F.col("n_tok")
    return cum.select(
        "doc_id",
        "source",
        "n_tok",
        F.floor(off / F.lit(float(PACK_BUDGET))).alias("window_id"),
        off.cast("bigint").alias("offset_tok"),
    ).orderBy("source", "doc_id")


# --------------------------------------------------------------------------
# Deterministic stratified sampling by language: per-stratum keep
# rates in sixteenths, decided by the doc's md5 bucket (stable across
# engines/partitionings, unlike rand(seed)).
# --------------------------------------------------------------------------
# lang -> keep rate numerator out of 16 md5 buckets
STRATA_RATES = {"en": 16, "es": 8, "de": 8, "fr": 8, "zh": 4}


def _md5_bucket_expr_sql() -> str:
    return "CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) " + " ".join(
        f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef")
    ) + " END"


@register(
    "samp_docs_lang_stratified",
    oracle=f"""
    WITH bucketed AS (
      SELECT doc_id, lang, {_md5_bucket_expr_sql()} AS bucket FROM documents
    )
    SELECT doc_id, lang, CAST(bucket AS INTEGER) AS bucket
    FROM bucketed
    WHERE bucket < CASE lang {" ".join(f"WHEN '{k}' THEN {v}" for k, v in STRATA_RATES.items())}
                   ELSE 2 END
    ORDER BY doc_id
    """,
)
def samp_docs_lang_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep rates (en 100%, es/de/fr 50%, zh 25%) via md5
    bucket membership — Spark's ``sampleBy`` semantics but reproducible
    across engines and partition layouts. Pure map-side filter: no
    shuffle at all, and the predicate pushes column pruning to the scan.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10).cast("int")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in STRATA_RATES.items()],
        F.lit(2),
    )
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"))
        .withColumn("_rate", rate)
        .filter(F.col("bucket") < F.col("_rate"))
        .drop("_rate")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Quality-weighted upsampling: repeat each document according to its
# length tier (the data-mixing primitive — higher-quality strata get
# more epochs in the training mix; tier 0 is dropped outright).
# --------------------------------------------------------------------------
UPSAMPLE_TIERS_SQL = (
    "CASE WHEN n_chars >= 300 THEN 3 WHEN n_chars >= 150 THEN 2 "
    "WHEN n_chars >= 50 THEN 1 ELSE 0 END"
)


@register(
    "samp_docs_upsample_by_tier",
    oracle=f"""
    WITH tiered AS (
      SELECT doc_id, CAST({UPSAMPLE_TIERS_SQL} AS INTEGER) AS tier FROM documents
    )
    SELECT doc_id, tier, CAST(c AS INTEGER) AS copy_idx
    FROM tiered, unnest(generate_series(1, tier)) AS t(c)
    ORDER BY doc_id, copy_idx
    """,
)
def samp_docs_upsample_by_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode each doc into `tier` copies (0 copies = filtered out).

    ``sequence(1, tier)`` + ``explode`` keeps the multiplication
    map-side — no join, no shuffle; at 100 TB the output is written
    straight back out partition-parallel. The copy index is explicit so
    downstream shuffles (e.g. global mix-shuffle by hash of
    (doc_id, copy_idx)) can separate the replicas deterministically.
    """
    docs = table(spark, sf_dir, "documents")
    tier = F.expr(UPSAMPLE_TIERS_SQL).cast("int")
    return (
        docs.select("doc_id", tier.alias("tier"))
        .filter(F.col("tier") >= 1)
        .select("doc_id", "tier", F.explode(F.sequence(F.lit(1), F.col("tier"))).alias("copy_idx"))
        .orderBy("doc_id", "copy_idx")
    )


# --------------------------------------------------------------------------
# Global mix-shuffle: deterministic random order + shard assignment —
# the last curation step before packing, so no source's docs end up
# adjacent in the training stream.
# --------------------------------------------------------------------------
MIX_SHARDS = 8


@register(
    "samp_docs_mix_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             md5(CAST(doc_id AS STRING) || '|mix') AS mk
      FROM documents
    )
    SELECT doc_id, source,
           CAST(row_number() OVER (ORDER BY mk, doc_id) % {MIX_SHARDS}
                AS BIGINT) AS shard,
           CAST(row_number() OVER (ORDER BY mk, doc_id) AS BIGINT) AS mix_pos
    FROM keyed
    ORDER BY mix_pos
    """,
)
def samp_docs_mix_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle the corpus into a deterministic random order and deal it
    round-robin into shards.

    The md5 sort key is engine- and partitioning-independent (re-runs
    and backfills produce the identical mix, unlike rand(seed)). The
    global position comes from ``global_rank`` — range-partitioned
    offset ranking, never a single-reducer sort (VERDICT r3 #3 shape).
    The round-robin deal by global position maximizes source
    interleaving within every shard.
    """
    from ..functions.ranking import global_rank

    docs = table(spark, sf_dir, "documents")
    mk = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|mix")))
    return (
        global_rank(
            docs.select("doc_id", "source", mk.alias("mk")),
            [F.col("mk"), F.col("doc_id")],
            "mix_pos",
        )
        .select(
            "doc_id",
            "source",
            (F.col("mix_pos") % MIX_SHARDS).alias("shard"),
            "mix_pos",
        )
        .orderBy("mix_pos")
    )


# --------------------------------------------------------------------------
# Length-bucketed inference batching: group documents into batches of
# similar token length so a serving fleet pads each batch to its
# bucket's cap instead of the global max (the fairseq/vLLM "bucketed
# batching" shape). Bucket membership comes from fixed token-length
# edges; batch capacity per bucket = floor(TOKEN_BUDGET / bucket cap),
# so every batch's padded size is bounded by the budget. Membership,
# ordering (md5-deterministic), and batch index are all
# engine-portable — no rand(), no partition-layout dependence.
#
# Scale: one shuffle keyed on the bucket id. Few buckets = coarse
# parallelism for the ranking window; at corpus scale, salt the
# window key by a doc_id range prefix and offset batch indices by the
# per-salt counts (the same 2-pass prefix-sum used in
# pack_token_windows).
# --------------------------------------------------------------------------
BATCH_TOKEN_BUDGET = 512
# (upper_edge_exclusive, padded_cap) — docs with n_tok >= last edge fall
# into the open top bucket with a fixed conservative cap.
LENGTH_BUCKETS = ((32, 32), (48, 48), (64, 64), (None, 128))


def _bucket_cap_sql() -> tuple[str, str]:
    whens, caps = [], []
    for i, (edge, cap) in enumerate(LENGTH_BUCKETS):
        cond = f"WHEN n_tok < {edge}" if edge is not None else "ELSE"
        whens.append(f"{cond} THEN {i}" if edge is not None else f"ELSE {i}")
        caps.append(f"WHEN {i} THEN {BATCH_TOKEN_BUDGET // cap}")
    return (
        "CASE " + " ".join(whens) + " END",
        "CASE bucket " + " ".join(caps) + " END",
    )


@register(
    "pack_length_buckets",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tok, CAST({_bucket_cap_sql()[0]} AS INTEGER) AS bucket
      FROM tok
    ),
    ranked AS (
      SELECT doc_id, n_tok, bucket,
             row_number() OVER (
               PARTITION BY bucket
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn,
             CAST({_bucket_cap_sql()[1]} AS BIGINT) AS cap
      FROM bucketed
    )
    SELECT doc_id, n_tok, bucket,
           CAST(floor((rn - 1) / cap) AS BIGINT) AS batch_id,
           CAST((rn - 1) % cap AS BIGINT) AS slot
    FROM ranked
    ORDER BY bucket, batch_id, slot
    """,
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each doc to a (length bucket, batch, slot): similar-length
    docs batch together under a fixed padded-token budget."""
    docs = table(spark, sf_dir, "documents")
    n_tok = F.size(tokens_col()).cast("bigint")

    bucket = None
    cap = None
    for i, (edge, c) in enumerate(LENGTH_BUCKETS):
        if edge is not None:
            cond = F.col("n_tok") < edge
            bucket = F.when(cond, i) if bucket is None else bucket.when(cond, i)
            cap = (
                F.when(F.col("bucket") == i, BATCH_TOKEN_BUDGET // c)
                if cap is None
                else cap.when(F.col("bucket") == i, BATCH_TOKEN_BUDGET // c)
            )
        else:
            bucket = bucket.otherwise(i)
            cap = cap.when(F.col("bucket") == i, BATCH_TOKEN_BUDGET // c)

    w = W.partitionBy("bucket").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = (
        docs.select("doc_id", n_tok.alias("n_tok"))
        .withColumn("bucket", bucket.cast("int"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("cap", cap.cast("bigint"))
    )
    return ranked.select(
        "doc_id",
        "n_tok",
        "bucket",
        F.floor((F.col("rn") - 1) / F.col("cap")).alias("batch_id"),
        ((F.col("rn") - 1) % F.col("cap")).alias("slot"),
    ).orderBy("bucket", "batch_id", "slot")


# --------------------------------------------------------------------------
# C4/RefinedWeb-style LINE-level dedup: the corpus-wide "every
# repeated line survives only at its first occurrence" pass that web
# pipelines run before document-level dedup (boilerplate sentences,
# nav text, license blocks repeat across unrelated pages). The
# provided docs are single-line, so "lines" are the deterministic
# non-overlapping 8-token chunks — same operator shape, same keep
# rule.
#
# Keep-first = row_number over (line) ordered by (doc_id, line_idx)
# == 1: one corpus-wide shuffle on the line hash, exactly the shape
# the exact-dedup operator uses at document grain. Per-doc survival
# stats come out of the same pass — no second scan.
# --------------------------------------------------------------------------
LINE_TOKENS = 8


@register(
    "dd_line_dedup_stats",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    lines AS (
      SELECT doc_id, i AS line_idx,
             array_to_string(t[i * {LINE_TOKENS} + 1 :
                               (i + 1) * {LINE_TOKENS}], ' ') AS line,
             least(len(t) - i * {LINE_TOKENS}, {LINE_TOKENS}) AS line_tokens
      FROM tok,
           unnest(range(0, CAST(ceil(len(t) / {LINE_TOKENS}.0) AS INTEGER)))
             AS u(i)
    ),
    tagged AS (
      SELECT doc_id, line_idx, line_tokens,
             row_number() OVER (PARTITION BY line
                                ORDER BY doc_id, line_idx) AS occ
      FROM lines
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN occ = 1 THEN line_tokens ELSE 0 END) AS BIGINT)
               AS tokens_kept,
           round(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
               AS keep_ratio
    FROM tagged
    GROUP BY doc_id
    """,
)
def dd_line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc survival statistics of corpus-wide keep-first line
    dedup over deterministic 8-token lines: total lines, kept lines,
    kept token mass, keep ratio."""
    docs = table(spark, sf_dir, "documents")
    t = F.split(F.trim("text"), r"\s+")
    lines = (
        docs.select("doc_id", t.alias("t"))
        .select(
            "doc_id",
            F.size("t").alias("n_tok"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, (size(t) + {LINE_TOKENS - 1})"
                    f" div {LINE_TOKENS} - 1), i -> named_struct("
                    f"'line_idx', i, "
                    f"'line', concat_ws(' ', slice(t, i * {LINE_TOKENS} + 1,"
                    f" {LINE_TOKENS}))))"
                )
            ).alias("s"),
        )
        .select(
            "doc_id",
            F.col("s.line_idx").alias("line_idx"),
            F.col("s.line").alias("line"),
            F.least(
                F.col("n_tok") - F.col("s.line_idx") * LINE_TOKENS,
                F.lit(LINE_TOKENS),
            ).alias("line_tokens"),
        )
    )
    occ = F.row_number().over(
        W.partitionBy("line").orderBy("doc_id", "line_idx")
    )
    tagged = lines.withColumn("occ", occ)
    kept = (F.col("occ") == 1).cast("int")
    return tagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        F.sum(kept * F.col("line_tokens")).cast("bigint").alias("tokens_kept"),
        F.round(F.sum(kept) * 1.0 / F.count(F.lit(1)), 6).alias("keep_ratio"),
    )


# --------------------------------------------------------------------------
# Per-source boilerplate lines — the diagnosis view the line-dedup pass
# above acts on: which repeated lines (deterministic 8-token chunks)
# recur across DISTINCT documents of the same source. Web pipelines run
# exactly this to find nav bars, cookie banners, and license blocks
# before stripping them; per-source because boilerplate is a property
# of the crawl origin, not the corpus.
#
# Scale: line extraction is the same map-side explode as the dedup
# pass; the (source, line, doc) distinct and the (source, line) count
# partial-aggregate map-side; the per-source top-k window runs over
# the repeated-lines relation only (already reduced), partitioned by
# source — never a global sort.
# --------------------------------------------------------------------------
BOILER_MIN_DOCS = 2
BOILER_TOPK = 10


@register(
    "txt_boilerplate_lines",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS t
      FROM documents
    ),
    lines AS (
      SELECT DISTINCT doc_id, source,
             array_to_string(t[i * {LINE_TOKENS} + 1 :
                               (i + 1) * {LINE_TOKENS}], ' ') AS line
      FROM tok,
           unnest(range(0, CAST(ceil(len(t) / {LINE_TOKENS}.0) AS INTEGER)))
             AS u(i)
    ),
    cnt AS (
      SELECT source, line, CAST(count(*) AS BIGINT) AS n_docs
      FROM lines GROUP BY source, line
      HAVING count(*) >= {BOILER_MIN_DOCS}
    )
    SELECT source, CAST(rnk AS INTEGER) AS rnk, line, n_docs FROM (
      SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY n_docs DESC, line) AS rnk
      FROM cnt
    ) WHERE rnk <= {BOILER_TOPK}
    """,
)
def txt_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BOILER_TOPK} lines per source recurring in >=
    {BOILER_MIN_DOCS} distinct documents (8-token chunk grain)."""
    docs = table(spark, sf_dir, "documents")
    t = F.split(F.trim("text"), r"\s+")
    lines = (
        docs.select("doc_id", "source", t.alias("t"))
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, (size(t) + {LINE_TOKENS - 1})"
                    f" div {LINE_TOKENS} - 1), i -> concat_ws(' ',"
                    f" slice(t, i * {LINE_TOKENS} + 1, {LINE_TOKENS})))"
                )
            ).alias("line"),
        )
        .distinct()
    )
    cnt = (
        lines.groupBy("source", "line")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILER_MIN_DOCS)
    )
    rnk = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("n_docs"), F.asc("line"))
    )
    return (
        cnt.withColumn("rnk", rnk.cast("int"))
        .filter(F.col("rnk") <= BOILER_TOPK)
        .select("source", "rnk", "line", "n_docs")
    )


# --------------------------------------------------------------------------
# Code-likeness detection — the curation screen that separates prose
# from code/markup/log spill before LM training: per-document symbol
# density, digit density and token-shape signals, all as exact
# integer character counts (regexp_replace strip-and-measure, POSIX
# classes shared verbatim by both engines), rolled up per source with
# ppm rates. Map-only over documents; one dimension-sized rollup.
# --------------------------------------------------------------------------
CODE_SYMBOL_PPM = 60_000  # >= 6% symbol chars -> code-like
CODE_DIGIT_PPM = 100_000  # >= 10% digit chars -> code-like


@register(
    "txt_code_detection",
    oracle=f"""
    WITH m AS (
      SELECT source,
             length(text) AS n_chars,
             length(text)
               - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))
                 AS n_symbols,
             length(text)
               - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits
      FROM documents WHERE length(text) > 0
    ),
    scored AS (
      SELECT source, n_chars, n_symbols, n_digits,
             CASE WHEN n_symbols * 1000000 >= n_chars * {CODE_SYMBOL_PPM}
                    OR n_digits * 1000000 >= n_chars * {CODE_DIGIT_PPM}
                  THEN 1 ELSE 0 END AS code_like
      FROM m
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(code_like) AS BIGINT) AS n_code_like,
           CAST(sum(code_like) AS BIGINT) * 1000000 // count(*)
               AS code_like_ppm,
           CAST(sum(n_symbols) AS BIGINT) * 1000000
             // CAST(sum(n_chars) AS BIGINT) AS symbol_ppm,
           CAST(sum(n_digits) AS BIGINT) * 1000000
             // CAST(sum(n_chars) AS BIGINT) AS digit_ppm
    FROM scored
    GROUP BY source
    """,
)
def txt_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source code-likeness screen: symbol/digit density ppm and
    the share of docs crossing the code-like thresholds."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chars = F.length("text")
    n_symbols = n_chars - F.length(
        F.regexp_replace("text", r"[^a-zA-Z0-9 ]", "")
    )
    n_digits = n_chars - F.length(F.regexp_replace("text", r"[0-9]", ""))
    m = docs.select(
        "source",
        n_chars.alias("n_chars"),
        n_symbols.alias("n_symbols"),
        n_digits.alias("n_digits"),
    )
    code_like = (
        F.when(
            (F.col("n_symbols") * 1000000 >= F.col("n_chars") * CODE_SYMBOL_PPM)
            | (F.col("n_digits") * 1000000 >= F.col("n_chars") * CODE_DIGIT_PPM),
            1,
        )
        .otherwise(0)
        .alias("code_like")
    )
    scored = m.select("source", "n_chars", "n_symbols", "n_digits", code_like)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("code_like").cast("bigint").alias("n_code_like"),
        F.expr(
            "CAST(sum(code_like) AS BIGINT) * CAST(1000000 AS BIGINT)"
            " DIV count(*)"
        ).alias("code_like_ppm"),
        F.expr(
            "CAST(sum(n_symbols) AS BIGINT) * CAST(1000000 AS BIGINT)"
            " DIV CAST(sum(n_chars) AS BIGINT)"
        ).alias("symbol_ppm"),
        F.expr(
            "CAST(sum(n_digits) AS BIGINT) * CAST(1000000 AS BIGINT)"
            " DIV CAST(sum(n_chars) AS BIGINT)"
        ).alias("digit_ppm"),
    )


# --------------------------------------------------------------------------
# Heavy-change token detection — the distribution-shift twin of the
# heavy-hitter query: which tokens' frequencies moved most between the
# two corpus halves (doc_id parity split — a deterministic stand-in
# for before/after snapshots). The change score is the cross-
# multiplied integer |f1*N2 - f2*N1| (comparing exact rationals
# f1/N1 vs f2/N2 without any division), so ranking is hash-stable.
# One token reduction + a dimension-sized top-K with total order.
# At stream scale the same statistic runs over two CMS sketches
# (sk_cms_token_estimates is the sketch side); this is the exact
# baseline that validates it.
# --------------------------------------------------------------------------
HEAVY_CHANGE_TOP = 20


@register(
    "txt_heavy_change_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id % 2 AS era, unnest({{tok}}) AS tok
      FROM documents
    ),
    counts AS (
      SELECT tok,
             CAST(sum(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f2
      FROM toks GROUP BY tok
    ),
    tot AS (
      SELECT CAST(sum(f1) AS BIGINT) AS n1, CAST(sum(f2) AS BIGINT) AS n2
      FROM counts
    )
    SELECT tok, f1, f2,
           abs(f1 * n2 - f2 * n1) AS change_x
    FROM counts CROSS JOIN tot
    ORDER BY change_x DESC, tok
    LIMIT {HEAVY_CHANGE_TOP}
    """.replace("{tok}", r"string_split_regex(trim(text), '\s+')"),
)
def txt_heavy_change_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{HEAVY_CHANGE_TOP} tokens by cross-multiplied frequency
    change between the doc_id-parity corpus halves."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("doc_id") % 2).alias("era"),
        F.explode(tokens_col()).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("era") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("era") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    tot = counts.agg(
        F.sum("f1").cast("bigint").alias("n1"),
        F.sum("f2").cast("bigint").alias("n2"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            "f1",
            "f2",
            F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
            .cast("bigint")
            .alias("change_x"),
        )
        .orderBy(F.desc("change_x"), "tok")
        .limit(HEAVY_CHANGE_TOP)
    )


# --------------------------------------------------------------------------
# Blocklist filter audit — the safety-filter plumbing every corpus
# pipeline runs (here with neutral stand-in terms, since the synthetic
# corpus has no unsafe content; the MECHANISM — multi-term match,
# per-source hit rates, term attribution — is what the oracle checks):
# which documents match any blocklist term, which term fired, at what
# per-source rate. Token-boundary regex shared verbatim by both
# engines; one map-only pass + a dimension-sized rollup.
# --------------------------------------------------------------------------
BLOCKLIST_TERMS = ("dolor", "vitae", "magna")

_BL_HITS = ", ".join(
    "CASE WHEN regexp_matches(text, '\\b%s\\b') THEN 1 ELSE 0 END AS hit_%s"
    % (t, t)
    for t in BLOCKLIST_TERMS
)
_BL_SUMS = ", ".join(
    "CAST(sum(hit_%s) AS BIGINT) AS n_%s" % (t, t) for t in BLOCKLIST_TERMS
)
_BL_ANY = " + ".join("hit_%s" % t for t in BLOCKLIST_TERMS)


@register(
    "txt_blocklist_filter_audit",
    oracle=f"""
    WITH m AS (
      SELECT source, {_BL_HITS}
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           {_BL_SUMS},
           CAST(sum(CASE WHEN {_BL_ANY} > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(sum(CASE WHEN {_BL_ANY} > 0 THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // count(*) AS flagged_ppm
    FROM m GROUP BY source
    """,
)
def txt_blocklist_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source blocklist hit rates with per-term attribution
    (word-boundary regex, exact ppm)."""
    docs = table(spark, sf_dir, "documents")
    hits = [
        F.when(F.col("text").rlike(rf"\b{t}\b"), 1).otherwise(0).alias(f"hit_{t}")
        for t in BLOCKLIST_TERMS
    ]
    m = docs.select("source", *hits)
    any_hit = None
    for t in BLOCKLIST_TERMS:
        c = F.col(f"hit_{t}")
        any_hit = c if any_hit is None else any_hit + c
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        *[
            F.sum(f"hit_{t}").cast("bigint").alias(f"n_{t}")
            for t in BLOCKLIST_TERMS
        ],
        F.sum(F.when(any_hit > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.expr(
            "CAST(sum(CASE WHEN "
            + " + ".join(f"hit_{t}" for t in BLOCKLIST_TERMS)
            + " > 0 THEN 1 ELSE 0 END) AS BIGINT)"
            " * CAST(1000000 AS BIGINT) DIV count(*)"
        ).alias("flagged_ppm"),
    )
