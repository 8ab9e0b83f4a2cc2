"""Corpus-curation operators: repetition signals and PII scrubbing.

Two additions a large-scale training-data pipeline needs beyond the
dedup/quality surface already in ``operators/text.py``:

- **Repetition statistics** (Gopher-style, cf. Rae et al. 2021 §A1.1):
  duplicate-token fraction, duplicate-bigram fraction, and
  most-frequent-bigram fraction per document. Excessively repetitive
  documents are low-quality boilerplate/spam and get flagged for
  removal before training.
- **PII detection + redaction**: regex-based email/phone detection and
  replacement. The contact strings are synthesized deterministically
  from ``customer`` keys (the test schema carries no real PII — same
  pattern as ``orders_base.messy_orders``), so the detection/redaction
  expressions run over realistically-shaped text and stay
  oracle-checkable bit-for-bit.

Scale notes (100 TB corpus):
- Everything here is pure column expressions (split / array HOFs /
  regexp) in whole-stage codegen — zero Python, zero UDFs.
- ``txt_repetition_stats`` computes token-level duplicate fractions
  with per-row array ops (NO shuffle at all), and the bigram mode via
  one explode + two-level aggregation, which partial-aggregates
  map-side: the shuffle carries one row per (doc, distinct bigram),
  never per token. No join back is needed — the per-doc token list
  stats ride along the explode via ``first()``.
- ``pii_scrub_contacts`` is a narrow projection: filters/regexes fuse
  into the scan stage and push column pruning down to parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table, widen_if_narrow
from ..registry import register

# --------------------------------------------------------------------------
# Repetition statistics (documents).
# --------------------------------------------------------------------------
# Thresholds sit at roughly the p85 of the synthetic corpus (measured:
# dup_token_frac median .54 / p90 .68; top_bigram_frac median .033 /
# p90 .069) so the flag splits the corpus rather than degenerating to a
# constant. Both engines compare the UNROUNDED doubles, computed by the
# identical expression tree, so the comparison can never straddle the
# threshold differently.
DUP_TOKEN_FLAG = 0.65
TOP_BIGRAM_FLAG = 0.06


@register(
    "txt_repetition_stats",
    oracle=rf"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ),
    b AS (
      SELECT doc_id, t,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM d
    ),
    bc AS (
      SELECT doc_id, any_value(t) AS t, bg, count(*) AS c
      FROM b GROUP BY doc_id, bg
    ),
    bs AS (
      SELECT doc_id, any_value(t) AS t,
             CAST(sum(c) AS DOUBLE) AS n_bigrams,
             CAST(count(*) AS DOUBLE) AS n_distinct_bigrams,
             CAST(max(c) AS DOUBLE) AS top_c
      FROM bc GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           round(1 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6) AS dup_token_frac,
           round(1 - n_distinct_bigrams / n_bigrams, 6) AS dup_bigram_frac,
           round(top_c / n_bigrams, 6) AS top_bigram_frac,
           CASE WHEN 1 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) > {DUP_TOKEN_FLAG}
                  OR top_c / n_bigrams > {TOP_BIGRAM_FLAG}
                THEN 'repetitive' ELSE 'ok' END AS repetition_flag
    FROM bs
    """,
)
def txt_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-document repetition signals.

    Duplicate-token fraction comes from per-row array ops (shuffle-free);
    the bigram statistics need the per-doc mode, which is an explode →
    count per (doc, bigram) → per-doc max/sum — both aggregations
    partial-aggregate map-side, so shuffled bytes are proportional to
    distinct bigrams per doc, not corpus token count. The token-list
    stats ride the same aggregation via first() instead of a join back
    to the base table (one pass over the scan, one shuffle key: doc_id).
    """
    docs = widen_if_narrow(table(spark, sf_dir, "documents"))
    d = docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("t"))
    bigrams = F.expr(
        "transform(sequence(1, size(t) - 1), "
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    )
    b = d.select("doc_id", "t", F.explode(bigrams).alias("bg"))
    bc = b.groupBy("doc_id", "bg").agg(
        F.first("t").alias("t"), F.count(F.lit(1)).alias("c")
    )
    bs = bc.groupBy("doc_id").agg(
        F.first("t").alias("t"),
        F.sum("c").cast("double").alias("n_bigrams"),
        F.count(F.lit(1)).cast("double").alias("n_distinct_bigrams"),
        F.max("c").cast("double").alias("top_c"),
    )
    dup_token = F.lit(1) - F.size(F.array_distinct("t")).cast("double") / F.size("t")
    return bs.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.round(dup_token, 6).alias("dup_token_frac"),
        F.round(F.lit(1) - F.col("n_distinct_bigrams") / F.col("n_bigrams"), 6).alias(
            "dup_bigram_frac"
        ),
        F.round(F.col("top_c") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        F.when(
            (dup_token > DUP_TOKEN_FLAG)
            | (F.col("top_c") / F.col("n_bigrams") > TOP_BIGRAM_FLAG),
            "repetitive",
        )
        .otherwise("ok")
        .alias("repetition_flag"),
    )


# --------------------------------------------------------------------------
# PII scrubbing (synthesized contact strings over customer).
# --------------------------------------------------------------------------
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\d{2}-\d{3}-\d{3}-\d{4}"

_PII_DOMAINS = ("example.com", "company.com", "gmail.com", "corp.com")

# Deterministic contact-blob synthesis shared by both engines: every
# derived digit group is pure integer arithmetic on c_custkey. Every
# third customer's blob carries no contact info so the detectors see a
# negative class too.
_CONTACTS_CTE = rf"""
contacts AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0
              THEN 'Account ' || c_name || ' has no contact info on file.'
              ELSE 'Reach ' || c_name || ' <' ||
                   regexp_replace(lower(c_name), '#', '', 'g') || '@' ||
                   CASE CAST(c_custkey % 4 AS INTEGER)
                        WHEN 0 THEN '{_PII_DOMAINS[0]}' WHEN 1 THEN '{_PII_DOMAINS[1]}'
                        WHEN 2 THEN '{_PII_DOMAINS[2]}' ELSE '{_PII_DOMAINS[3]}' END ||
                   '> or call ' ||
                   printf('%d-%d-%d-%d',
                          10 + c_custkey % 90,
                          100 + (c_custkey * 7) % 900,
                          100 + (c_custkey * 13) % 900,
                          1000 + (c_custkey * 31) % 9000) || ' today.'
         END AS contact_blob
  FROM customer
)
"""


def contact_directory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _CONTACTS_CTE (free-text blobs w/ synthetic PII)."""
    c = widen_if_narrow(table(spark, sf_dir, "customer"))
    k = F.col("c_custkey")
    domain = F.when(F.lit(False), "")
    for i, dom in enumerate(_PII_DOMAINS):
        domain = domain.when(k % 4 == i, dom)
    domain = domain.otherwise(_PII_DOMAINS[0])
    phone = F.format_string(
        "%d-%d-%d-%d",
        (k % 90 + 10).cast("bigint"),
        ((k * 7) % 900 + 100).cast("bigint"),
        ((k * 13) % 900 + 100).cast("bigint"),
        ((k * 31) % 9000 + 1000).cast("bigint"),
    )
    email = F.concat(
        F.regexp_replace(F.lower("c_name"), "#", ""), F.lit("@"), domain
    )
    blob = F.when(
        k % 3 == 0,
        F.concat(F.lit("Account "), F.col("c_name"), F.lit(" has no contact info on file.")),
    ).otherwise(
        F.concat(
            F.lit("Reach "), F.col("c_name"), F.lit(" <"), email, F.lit("> or call "),
            phone, F.lit(" today."),
        )
    )
    return c.select("c_custkey", blob.alias("contact_blob"))


@register(
    "pii_scrub_contacts",
    oracle=rf"""
    WITH {_CONTACTS_CTE}
    SELECT c_custkey,
           CAST(len(regexp_extract_all(contact_blob, '{EMAIL_RE}')) AS INTEGER)
               AS emails_found,
           CAST(len(regexp_extract_all(contact_blob, '{PHONE_RE}')) AS INTEGER)
               AS phones_found,
           CAST(regexp_matches(contact_blob, '{EMAIL_RE}')
                OR regexp_matches(contact_blob, '{PHONE_RE}') AS BOOLEAN) AS has_pii,
           regexp_replace(regexp_replace(contact_blob, '{EMAIL_RE}', '[EMAIL]', 'g'),
                          '{PHONE_RE}', '[PHONE]', 'g') AS redacted_blob
    FROM contacts
    """,
)
def pii_scrub_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect and redact emails/phone numbers in free text.

    Detection counts + a has_pii flag + the redacted text, all as
    regexp expressions (Spark regexp_replace is global like DuckDB's
    'g' flag; counting uses regexp_count / len(regexp_extract_all)).
    At corpus scale this is a map-only projection — no shuffle, fully
    fused into the scan, and trivially parallel over any partitioning.
    """
    blob = F.col("contact_blob")
    return contact_directory(spark, sf_dir).select(
        "c_custkey",
        F.regexp_count(blob, F.lit(EMAIL_RE)).cast("int").alias("emails_found"),
        F.regexp_count(blob, F.lit(PHONE_RE)).cast("int").alias("phones_found"),
        (blob.rlike(EMAIL_RE) | blob.rlike(PHONE_RE)).alias("has_pii"),
        F.regexp_replace(
            F.regexp_replace(blob, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
        ).alias("redacted_blob"),
    )


@register(
    "pii_summary_by_segment",
    oracle=rf"""
    WITH {_CONTACTS_CTE},
    scrub AS (
      SELECT c.c_custkey, cu.c_mktsegment,
             CAST(regexp_matches(contact_blob, '{EMAIL_RE}')
                  OR regexp_matches(contact_blob, '{PHONE_RE}') AS BOOLEAN) AS has_pii
      FROM contacts c JOIN customer cu USING (c_custkey)
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(CASE WHEN has_pii THEN 1 ELSE 0 END) AS BIGINT) AS n_with_pii,
           round(avg(CASE WHEN has_pii THEN 1.0 ELSE 0.0 END), 6) AS pii_rate
    FROM scrub GROUP BY c_mktsegment
    """,
)
def pii_summary_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII incidence per market segment — the audit rollup a compliance
    pass emits after scrubbing. One hash aggregate over the scrub
    projection; the segment join is broadcast (customer is a dimension
    here)."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    scrub = pii_scrub_contacts(spark, sf_dir).select("c_custkey", "has_pii")
    joined = scrub.join(F.broadcast(c), "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.sum(F.col("has_pii").cast("int")).cast("bigint").alias("n_with_pii"),
        F.round(F.avg(F.col("has_pii").cast("double")), 6).alias("pii_rate"),
    )
