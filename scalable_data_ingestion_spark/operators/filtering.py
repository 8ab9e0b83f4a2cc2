"""Model-based corpus filtering and mixing: hashed linear quality
classifier, Bloom-filter decontamination, temperature resampling.

Three curation primitives the earlier operator families don't cover:

- **Hashed linear classifier** (``txt_hash_classifier_score``): the
  fastText-shaped quality filter — hash each token into one of 256
  buckets, score the document as the mean bucket weight, squash with a
  sigmoid, threshold into keep/drop. The *plumbing* (feature hashing,
  exact mean over a weight table, calibrated cutoff) is the real
  production shape; the weight table here is a deterministic function
  of the bucket id (w = bucket - 128) standing in for learned weights,
  the same honest-stub policy as the multimodal codec
  (operators/multimodal.py).
- **Bloom decontamination** (``dd_bloom_decontaminate``): membership
  pre-filter against benchmark shingles using K md5-derived bit
  positions in a 2^16 slot space. At scale the bench bitmap (2^16 bits
  = 8 KiB regardless of benchmark size) broadcasts to every executor
  and the probe is map-only; here the position set is kept relational
  (a broadcast equi-join) so DuckDB can value-check the exact same
  hits, false positives included.
- **Temperature resampling** (``samp_temperature_mix``): rebalance the
  language mix toward p_l^TAU (TAU < 1 upweights rare languages — the
  multilingual-pretraining mixing rule). Per-language keep rates are
  derived from corpus shares and applied by deterministic md5 bucket,
  so the sample is reproducible across engines and partitionings.

Scale notes (100 TB corpus):
- The classifier is one explode + one groupBy keyed on doc_id; bucket
  weights are integers summed exactly (no float drift), and with a
  real learned table the 256-row (or 2^20-row) weight relation stays
  broadcast-sized.
- Bloom probe volume is ~tokens x K positions, but every position
  lookup is against an 8 KiB structure — no shuffle grows with the
  benchmark; the per-doc hit rollup is the only wide edge and it keys
  on doc_id.
- Temperature mix is a map-side filter after a dimension-sized
  aggregate (#languages rows); no corpus shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ._branches import explode_branches
from ..registry import register
from .text import tokens_col

_TOKENS_SQL = r"string_split_regex(trim(text), '\s+')"


def _hex_int_sql(expr: str, start: int, ndigits: int) -> str:
    """DuckDB SQL for parsing ``ndigits`` hex chars of ``expr`` starting
    at 1-based ``start`` into an integer (DuckDB has no conv())."""
    digit = lambda pos: (  # noqa: E731
        f"(CASE substr({expr}, {pos}, 1) "
        + " ".join(f"WHEN '{h}' THEN {i}" for i, h in enumerate("0123456789abcdef"))
        + " END)"
    )
    parts = [
        f"{digit(start + i)} * {16 ** (ndigits - 1 - i)}" for i in range(ndigits)
    ]
    return "(" + " + ".join(parts) + ")"


# --------------------------------------------------------------------------
# fastText-shaped hashed linear quality classifier.
# --------------------------------------------------------------------------
CLS_BUCKETS = 256
CLS_KEEP_PROB = 0.5


@register(
    "txt_hash_classifier_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
    ),
    feat AS (
      SELECT doc_id,
             {_hex_int_sql("md5(tok)", 1, 2)} - 128 AS w
      FROM toks
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(w) AS BIGINT) AS score_fx
      FROM feat GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           floor(score_fx / (128.0 * n_tokens) * 1000000 + 0.5) / 1000000
               AS mean_score,
           floor(1000000.0 / (1.0 + exp(-4.0 * score_fx / (128.0 * n_tokens))) + 0.5)
               / 1000000 AS keep_prob,
           CASE WHEN 1.0 / (1.0 + exp(-4.0 * score_fx / (128.0 * n_tokens)))
                     >= {CLS_KEEP_PROB}
                THEN 'keep' ELSE 'drop' END AS cls_flag
    FROM agg
    """,
)
def txt_hash_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear classifier over hashed bag-of-tokens features.

    Each token hashes (md5 first byte) to one of {CLS_BUCKETS} buckets
    whose integer weight is summed exactly per document — the
    feature-hashing trick, so the model is a fixed-size table
    independent of vocabulary growth. The sigmoid of the scaled mean
    is the keep probability. One explode + one doc-keyed groupBy;
    bucket weights are integers so the aggregation is exact under any
    shuffle order (same fixed-point policy as operators/clustering.py).
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    w = F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("bigint") - 128
    agg = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("w").cast("bigint").alias("score_fx"),
    )
    mean = F.col("score_fx") / (F.lit(128.0) * F.col("n_tokens"))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-4.0) * mean))
    # floor(x*1e6 + 0.5) quantization, not round(): score_fx/(128*n) can land
    # exactly on a 5e-7 boundary (power-of-two denominator), where Spark's
    # HALF_UP and DuckDB's half-even disagree; floor is engine-independent.
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return agg.select(
        "doc_id",
        "n_tokens",
        q6(mean).alias("mean_score"),
        q6(prob).alias("keep_prob"),
        F.when(prob >= CLS_KEEP_PROB, "keep").otherwise("drop").alias("cls_flag"),
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination pre-filter.
# --------------------------------------------------------------------------
BLOOM_BENCH_MOD = 50  # same bench split as txt_decontamination
BLOOM_K = 3  # hash functions per shingle
BLOOM_SLOTS = 65536  # 2^16 slots (4 hex digits of md5)
BLOOM_MIN_HITS = 3  # >= this many probable-member shingles => flag


@register(
    "dd_bloom_decontaminate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
      WHERE len({_TOKENS_SQL}) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
      FROM tok, unnest(generate_series(1, len(t) - 2)) AS u(i)
    ),
    pos AS (
      SELECT doc_id, sh, j,
             CASE j WHEN 0 THEN {_hex_int_sql("md5(sh)", 1, 4)}
                    WHEN 1 THEN {_hex_int_sql("md5(sh)", 9, 4)}
                    ELSE {_hex_int_sql("md5(sh)", 17, 4)} END AS p
      FROM sh, unnest(generate_series(0, {BLOOM_K - 1})) AS v(j)
    ),
    bloom AS (
      SELECT DISTINCT p FROM pos WHERE doc_id % {BLOOM_BENCH_MOD} = 0
    ),
    probe AS (
      SELECT pos.doc_id, pos.sh, count(*) AS k_in
      FROM pos JOIN bloom USING (p)
      WHERE pos.doc_id % {BLOOM_BENCH_MOD} <> 0
      GROUP BY pos.doc_id, pos.sh
    ),
    hits AS (
      SELECT doc_id, count(*) AS bloom_hits
      FROM probe WHERE k_in = {BLOOM_K} GROUP BY doc_id
    ),
    nsh AS (
      SELECT doc_id, count(*) AS n_shingles FROM sh
      WHERE doc_id % {BLOOM_BENCH_MOD} <> 0 GROUP BY doc_id
    )
    SELECT n.doc_id,
           CAST(n.n_shingles AS BIGINT) AS n_shingles,
           CAST(coalesce(h.bloom_hits, 0) AS BIGINT) AS bloom_hits,
           CASE WHEN coalesce(h.bloom_hits, 0) >= {BLOOM_MIN_HITS}
                THEN 'flag' ELSE 'clean' END AS bloom_flag
    FROM nsh n LEFT JOIN hits h USING (doc_id)
    """,
)
def dd_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-screen against benchmark shingles.

    Benchmark shingles (same doc_id % {BLOOM_BENCH_MOD} split as
    ``txt_decontamination``) each set {BLOOM_K} positions in a
    {BLOOM_SLOTS}-slot space (16-bit md5 slices); a corpus shingle is a
    *probable member* when all {BLOOM_K} of its positions are set, and
    a document is flagged at >= {BLOOM_MIN_HITS} probable-member
    shingles. False positives are inherent and included — this is the
    cheap first pass that gates the exact-overlap join.

    Scale: the filter is a fixed 2^16-slot bitmap (8 KiB) no matter how
    large the benchmark — it broadcasts everywhere and the probe is
    map-side. Here the set is kept relational (broadcast equi-join on
    position) so the oracle can reproduce the identical hit set.
    """
    docs = table(spark, sf_dir, "documents")
    sh = (
        docs.select("doc_id", tokens_col().alias("t"))
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
    slot = lambda start: F.conv(  # noqa: E731
        F.substring(F.md5("sh"), start, 4), 16, 10
    ).cast("int")
    pos = sh.select(
        "doc_id",
        "sh",
        F.explode(F.array(slot(1), slot(9), slot(17))).alias("p"),
    )
    bloom = (
        pos.filter(F.col("doc_id") % BLOOM_BENCH_MOD == 0).select("p").distinct()
    )
    probe = (
        pos.filter(F.col("doc_id") % BLOOM_BENCH_MOD != 0)
        .join(F.broadcast(bloom), "p")
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("k_in"))
    )
    hits = (
        probe.filter(F.col("k_in") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("bloom_hits"))
    )
    nsh = (
        sh.filter(F.col("doc_id") % BLOOM_BENCH_MOD != 0)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    bh = F.coalesce(F.col("bloom_hits"), F.lit(0))
    return nsh.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        bh.cast("bigint").alias("bloom_hits"),
        F.when(bh >= BLOOM_MIN_HITS, "flag").otherwise("clean").alias("bloom_flag"),
    )


# --------------------------------------------------------------------------
# Temperature resampling of the language mix.
# --------------------------------------------------------------------------
MIX_TAU = 0.5  # temperature < 1 flattens the mix toward rare languages
MIX_BUCKETS = 4096  # md5 bucket resolution for the keep decision


@register(
    "samp_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS c FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang, c,
             round(pow(c * 1.0 / min(c) OVER (), {MIX_TAU} - 1.0), 6) AS keep_rate
      FROM counts
    ),
    bucketed AS (
      SELECT d.doc_id, d.lang, r.keep_rate,
             {_hex_int_sql("md5(CAST(d.doc_id AS VARCHAR) || '|temp')", 1, 3)}
                 AS bucket
      FROM documents d JOIN rates r USING (lang)
    )
    SELECT doc_id, lang, keep_rate, CAST(bucket AS INTEGER) AS bucket
    FROM bucketed
    WHERE bucket < CAST(floor(keep_rate * {MIX_BUCKETS}) AS INTEGER)
    ORDER BY doc_id
    """,
)
def samp_docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resample the corpus so language shares move from p_l
    toward p_l^{MIX_TAU} (rarest language keeps 100%, dominant languages
    are downsampled by (c_l/c_min)^(TAU-1)).

    The per-language keep rate comes from a #languages-row aggregate
    (dimension-sized, broadcast back); the keep decision is a pure
    map-side md5-bucket test, so the resample costs zero corpus
    shuffles and is bit-reproducible across engines, re-runs, and
    partition layouts (unlike rand(seed)). Rates are rounded to 6 dp
    before the bucket threshold so both engines derive the identical
    integer cutoff.
    """
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    # global min count as a broadcast 1-row cross join (no window over
    # the per-language counts)
    cmin = counts.agg(F.min("c").alias("_cmin"))
    rate = F.round(
        F.pow(F.col("c") / F.col("_cmin"), F.lit(MIX_TAU - 1.0)), 6
    )
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        "lang", rate.alias("keep_rate")
    )
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|temp"))), 1, 3),
        16,
        10,
    ).cast("int")
    return (
        docs.join(F.broadcast(rates), "lang")
        .select("doc_id", "lang", "keep_rate", bucket.alias("bucket"))
        .filter(F.col("bucket") < F.floor(F.col("keep_rate") * MIX_BUCKETS).cast("int"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Classifier evaluation: exact ROC-AUC of the hashed quality score
# against the is-English label — the eval harness for the model-based
# filter above (same family as dd_lsh_eval / sim_ivf_recall_at_k: every
# model-shaped operator ships with its measured-quality twin).
#
# AUC is computed as the Mann-Whitney U statistic with the tie-aware
# midrank convention, entirely in BIGINT: group documents by their
# (bit-identical cross-engine) score, take p = positives and n =
# negatives per distinct score, then
#     2U = sum_s  p_s * (2 * negatives_below(s) + n_s)
# so AUC = 2U / (2 * P * N) exactly — no float accumulates across
# groups, only one final scalar division.
#
# Scale: documents reduce to a distinct-score histogram first (the
# per-doc score aggregation is the classifier's own doc_id-keyed
# shuffle); the running negatives-below window then runs over the
# histogram, which is at most |distinct scores| rows. For truly
# unbounded score domains the same statistic is computed on a
# fixed-width quantized histogram (the standard streaming-AUC
# compromise); at dimension scale the single-partition window is the
# right plan.
# --------------------------------------------------------------------------
_AUC_AGG_SQL = f"""
  toks AS (
    SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
  ),
  feat AS (
    SELECT doc_id, {_hex_int_sql("md5(tok)", 1, 2)} - 128 AS w FROM toks
  ),
  agg AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w) AS BIGINT) AS score_fx
    FROM feat GROUP BY doc_id
  ),
  labeled AS (
    SELECT a.score_fx / (128.0 * a.n_tokens) AS s,
           CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM agg a JOIN documents d USING (doc_id)
  ),
  hist AS (
    SELECT s,
           CAST(sum(pos) AS BIGINT) AS p,
           CAST(sum(1 - pos) AS BIGINT) AS n
    FROM labeled GROUP BY s
  ),
  run AS (
    SELECT p, n,
           coalesce(sum(n) OVER (ORDER BY s
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS neg_below
    FROM hist
  )
"""


@register(
    "eval_classifier_auc",
    oracle=f"""
    WITH {_AUC_AGG_SQL}
    SELECT CAST(sum(p) AS BIGINT) AS n_pos,
           CAST(sum(n) AS BIGINT) AS n_neg,
           CAST(sum(p * (2 * neg_below + n)) AS BIGINT) AS u2,
           round(CAST(sum(p * (2 * neg_below + n)) AS DOUBLE)
                 / (2.0 * sum(p) * sum(n)), 6) AS auc
    FROM run
    """,
)
def eval_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC of the hashed classifier score for the
    lang='en' label, via the integer Mann-Whitney statistic."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    w = F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("bigint") - 128
    agg = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("w").cast("bigint").alias("score_fx"),
    )
    labeled = agg.join(docs.select("doc_id", "lang"), "doc_id").select(
        (F.col("score_fx") / (128.0 * F.col("n_tokens"))).alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    hist = labeled.groupBy("s").agg(
        F.sum("pos").cast("bigint").alias("p"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("n"),
    )
    # exclusive prefix sum over the score histogram via the
    # range-partitioned 2-pass scan (the histogram's distinct-score
    # cardinality grows with the corpus — no single-partition window)
    from ..functions.ranking import global_running_sum

    run = global_running_sum(
        hist, [F.col("s")], F.col("n"), "neg_below", inclusive=False
    )
    return run.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("n").cast("bigint").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("neg_below") + F.col("n")))
        .cast("bigint")
        .alias("u2"),
        F.round(
            F.sum(F.col("p") * (2 * F.col("neg_below") + F.col("n"))).cast("double")
            / (2.0 * F.sum("p") * F.sum("n")),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Classifier calibration (reliability diagram + ECE) — the second half
# of the model-eval story next to eval_classifier_auc: AUC says the
# ranking is right, calibration says the PROBABILITIES are right,
# which is what a keep-threshold actually consumes. Ten fixed
# probability bins; per bin the mean predicted keep-probability vs the
# empirical positive rate, plus the expected-calibration-error terms.
#
# Exactness: predicted probabilities enter as the classifier's own
# 1e-6-quantized micro-units summed as BIGINT (never a float sum of
# rounded doubles), and the bin id is integer arithmetic on the same
# micro value — both engines bin and average identically.
# --------------------------------------------------------------------------
CAL_BINS = 10


@register(
    "eval_classifier_calibration",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
    ),
    feat AS (
      SELECT doc_id, {_hex_int_sql("md5(tok)", 1, 2)} - 128 AS w FROM toks
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(w) AS BIGINT) AS score_fx
      FROM feat GROUP BY doc_id
    ),
    scored AS (
      SELECT a.doc_id,
             CAST(floor(1000000.0
                        / (1.0 + exp(-4.0 * a.score_fx / (128.0 * a.n_tokens)))
                        + 0.5) AS BIGINT) AS p_micro,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM agg a JOIN documents d USING (doc_id)
    ),
    binned AS (
      SELECT least(p_micro // 100000, {CAL_BINS - 1}) AS bin, p_micro, pos
      FROM scored
    ),
    cells AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(pos) AS BIGINT) AS n_pos,
             CAST(sum(p_micro) AS BIGINT) AS sp
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM cells)
    SELECT CAST(bin AS INTEGER) AS bin, n_docs, n_pos,
           round(sp / (1000000.0 * n_docs), 6) AS avg_pred,
           round(CAST(n_pos AS DOUBLE) / n_docs, 6) AS frac_pos,
           round(abs(sp / (1000000.0 * n_docs)
                     - CAST(n_pos AS DOUBLE) / n_docs), 6) AS abs_gap,
           round((CAST(n_docs AS DOUBLE) / tot.n)
                 * abs(sp / (1000000.0 * n_docs)
                       - CAST(n_pos AS DOUBLE) / n_docs), 6) AS ece_term
    FROM cells CROSS JOIN tot
    """,
)
def eval_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the hashed classifier's keep-probability
    vs the lang='en' label, in {CAL_BINS} fixed bins, with per-bin
    ECE terms."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    w = F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("bigint") - 128
    agg = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("w").cast("bigint").alias("score_fx"),
    )
    mean = F.col("score_fx") / (F.lit(128.0) * F.col("n_tokens"))
    p_micro = (
        F.floor(F.lit(1000000.0) / (F.lit(1.0) + F.exp(F.lit(-4.0) * mean)) + 0.5)
    ).cast("bigint")
    scored = agg.join(docs.select("doc_id", "lang"), "doc_id").select(
        p_micro.alias("p_micro"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    binned = scored.select(
        F.least(F.expr("p_micro DIV 100000"), F.lit(CAL_BINS - 1)).alias("bin"),
        "p_micro",
        "pos",
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("p_micro").cast("bigint").alias("sp"),
    )
    tot = cells.agg(F.sum("n_docs").cast("bigint").alias("n"))
    avg_pred = F.col("sp") / (F.lit(1000000.0) * F.col("n_docs"))
    frac_pos = F.col("n_pos").cast("double") / F.col("n_docs")
    gap = F.abs(avg_pred - frac_pos)
    return cells.crossJoin(F.broadcast(tot)).select(
        F.col("bin").cast("int").alias("bin"),
        "n_docs",
        "n_pos",
        F.round(avg_pred, 6).alias("avg_pred"),
        F.round(frac_pos, 6).alias("frac_pos"),
        F.round(gap, 6).alias("abs_gap"),
        F.round((F.col("n_docs").cast("double") / F.col("n")) * gap, 6).alias(
            "ece_term"
        ),
    )


# --------------------------------------------------------------------------
# Operating-point sweep for the hashed keep-classifier — the third
# panel of the model-eval triptych (AUC ranks, calibration checks the
# probabilities, THIS picks the threshold): confusion counts and
# precision/recall/F1 at nine fixed score thresholds, in one stacked
# conditional aggregation pass (the conversion-window-sensitivity
# shape — never nine scans).
#
# Exactness: the score s = score_fx / (128 * n_tokens) is a single
# IEEE division of integers (bit-identical cross-engine); comparisons
# against literal thresholds are therefore exact, and every output is
# an integer count or a ppm floor division. F1 also ships as an exact
# rational (f1_num = 2*tp, f1_den = 2*tp + fp + fn).
# --------------------------------------------------------------------------
F1_THRESHOLDS = (-0.04, -0.03, -0.02, -0.01, 0.0, 0.01, 0.02, 0.03, 0.04)

# the toks/feat/agg prefix of the AUC pipeline (shared classifier score)
_SCORE_PREFIX_SQL = _AUC_AGG_SQL.split("labeled AS")[0].rstrip().rstrip(",")


@register(
    "eval_f1_threshold_sweep",
    oracle=f"""
    WITH {_SCORE_PREFIX_SQL},
    scored AS (
      SELECT a.score_fx / (128.0 * a.n_tokens) AS s,
             CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM agg a JOIN documents d USING (doc_id)
    ),
    sweep AS (
      {" UNION ALL ".join(
          f'''SELECT {t} AS threshold,
             CAST(sum(CASE WHEN s >= {t} AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s >= {t} AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s < {t} AND pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN s < {t} AND pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored''' for t in F1_THRESHOLDS)}
    )
    SELECT threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp)
                ELSE CAST(0 AS BIGINT) END AS precision_ppm,
           CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn)
                ELSE CAST(0 AS BIGINT) END AS recall_ppm,
           2 * tp AS f1_num,
           2 * tp + fp + fn AS f1_den
    FROM sweep
    """,
)
def eval_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts + exact-rational precision/recall/F1 for the
    hashed keep-classifier at nine literal thresholds, one agg pass."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    w = F.conv(F.substring(F.md5("tok"), 1, 2), 16, 10).cast("bigint") - 128
    agg = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("w").cast("bigint").alias("score_fx"),
    )
    scored = agg.join(docs.select("doc_id", "lang"), "doc_id").select(
        (F.col("score_fx") / (128.0 * F.col("n_tokens"))).alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    cells = scored.agg(
        *[
            agg_col
            for t in F1_THRESHOLDS
            for agg_col in (
                F.sum(
                    F.when((F.col("s") >= t) & (F.col("pos") == 1), 1).otherwise(0)
                ).cast("bigint").alias(f"tp_{F1_THRESHOLDS.index(t)}"),
                F.sum(
                    F.when((F.col("s") >= t) & (F.col("pos") == 0), 1).otherwise(0)
                ).cast("bigint").alias(f"fp_{F1_THRESHOLDS.index(t)}"),
                F.sum(
                    F.when((F.col("s") < t) & (F.col("pos") == 1), 1).otherwise(0)
                ).cast("bigint").alias(f"fn_{F1_THRESHOLDS.index(t)}"),
                F.sum(
                    F.when((F.col("s") < t) & (F.col("pos") == 0), 1).otherwise(0)
                ).cast("bigint").alias(f"tn_{F1_THRESHOLDS.index(t)}"),
            )
        ]
    )
    outs = []
    for i, t in enumerate(F1_THRESHOLDS):
        tp, fp = F.col(f"tp_{i}"), F.col(f"fp_{i}")
        fn, tn = F.col(f"fn_{i}"), F.col(f"tn_{i}")
        outs.append(
            F.struct(
                F.lit(t).alias("threshold"),
                tp.alias("tp"),
                fp.alias("fp"),
                fn.alias("fn"),
                tn.alias("tn"),
                F.when(
                    tp + fp > 0,
                    F.expr(f"tp_{i} * CAST(1000000 AS BIGINT) DIV (tp_{i} + fp_{i})"),
                )
                .otherwise(F.lit(0).cast("bigint"))
                .alias("precision_ppm"),
                F.when(
                    tp + fn > 0,
                    F.expr(f"tp_{i} * CAST(1000000 AS BIGINT) DIV (tp_{i} + fn_{i})"),
                )
                .otherwise(F.lit(0).cast("bigint"))
                .alias("recall_ppm"),
                (2 * tp).cast("bigint").alias("f1_num"),
                (2 * tp + fp + fn).cast("bigint").alias("f1_den"),
            )
        )
    # Single reference to the one-row confusion grid (union-of-selects
    # would rescan the scored corpus once per threshold).
    return explode_branches(cells, outs)
