"""Winnowing document fingerprints (MOSS-style local fingerprinting).

Robust winnowing [Schleimer, Wilkerson, Aiken, SIGMOD '03 — "Winnowing:
Local Algorithms for Document Fingerprinting"]: hash every character
k-gram, slide a window of w consecutive hashes, and keep the minimum
hash of each window. The selected fingerprints are a position-robust
~2/(w+1)-density sketch of the document: any shared substring of
length >= k + w - 1 between two documents is *guaranteed* to produce
at least one shared fingerprint — unlike MinHash, which only matches
whole-document similarity, winnowing finds span-level overlap
(partial copies, quote reuse, boilerplate headers).

Spark-first shape — entirely map-side until the pair join:

    scan -> [per row] k-gram hashes as one array expression
         -> window minima via transform+slice+array_min (no window
            function, no shuffle — the "window" is over an in-row array)
         -> array_distinct -> explode

so fingerprint extraction is a single narrow stage inside whole-stage
codegen; the only shuffles are the fingerprint-keyed pair join and the
per-doc aggregate. At 100 TB the pair join is keyed on an 8-hex hash
(uniform), with a document-frequency cap dropping boilerplate
fingerprints that appear in > WINNOW_DF_CAP docs (the same inverted-
index skew guard as the shingle joins in operators/dedup.py).

Determinism: hashes are the first 8 hex chars of md5 (identical
function in DuckDB), minima are lexicographic on fixed-width hex — no
floats anywhere until the final rounded ratios.

Reference scope: the reference engine (src/transformation.py) has no
span-level dedup; this is part of the LLM-pipeline extension surface
(SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register

WINNOW_K = 8  # character k-gram length
WINNOW_W = 4  # winnowing window (hashes per window)
WINNOW_DF_CAP = 50  # drop fingerprints shared by more docs (skew guard)
WINNOW_MIN_SHARED = 3  # report pairs sharing at least this many fingerprints

# Shared corpus: every 20th doc reappears truncated to its first 200
# chars under doc_id+1000000, so the operator has genuine partial-copy
# structure to find at any SF (same injection convention as
# dd_exact_dedup in operators/dedup.py).
_CORPUS_CTE = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, substr(text, 1, 200) AS text
  FROM documents WHERE doc_id % 20 = 0
)
"""

# DuckDB fingerprint pipeline: per-position k-gram hashes, then the
# per-window minimum via a ROWS window frame (the relational spelling of
# the same array computation Spark does in-row).
_FPS_CTE = f"""
norm AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS txt FROM corpus
),
ok AS (
  SELECT doc_id, txt, len(txt) AS L FROM norm
  WHERE len(txt) >= {WINNOW_K + WINNOW_W - 1}
),
pos AS (
  SELECT doc_id, txt, L, unnest(generate_series(1, L - {WINNOW_K - 1})) AS i FROM ok
),
h AS (
  SELECT doc_id, L, i,
         substr(md5(substr(txt, i, {WINNOW_K})), 1, 8) AS hv
  FROM pos
),
winmin AS (
  SELECT doc_id, L, i,
         min(hv) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
  FROM h
),
fps AS (
  SELECT DISTINCT doc_id, L, fp FROM winmin
  WHERE i <= L - {WINNOW_K + WINNOW_W - 2}
)
"""


def _winnow_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.substring("text", 1, 200).alias("text"),
    )
    corpus = docs.unionByName(dupes)
    txt = F.regexp_replace(F.lower("text"), r"\s+", " ")
    return corpus.select("doc_id", txt.alias("txt")).filter(
        F.length("txt") >= WINNOW_K + WINNOW_W - 1
    )


def winnow_fingerprints_of(docs: DataFrame) -> DataFrame:
    """(doc_id, L, fp) distinct winnowing fingerprints of an arbitrary
    (doc_id, text) relation — normalization, length filter and the
    narrow array pipeline in one map-only pass (shared by the batch
    queries here and streaming/span_dedup.py's store-dedup sink)."""
    c = docs.select(
        "doc_id",
        F.regexp_replace(F.lower("text"), r"\s+", " ").alias("txt"),
    ).filter(F.length("txt") >= WINNOW_K + WINNOW_W - 1)
    return _fps_of_normalized(c)


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, L, fp) distinct winnowing fingerprints, computed with a
    single narrow array pipeline per row (no shuffle).

    The k-gram hash array is materialized through an ``explode(array(
    ...))`` generator barrier before the window minima read it.
    Without the barrier, CollapseProject inlines the hash-array
    expression into every window's lambda and — because higher-order
    functions get no common-subexpression elimination — the full
    O(len) md5 sweep re-runs per window position: O(len^2) hashing,
    measured 20x slower at 300-char docs. The Generate node pins one
    evaluation per row and keeps the stage narrow (no Exchange)."""
    return _fps_of_normalized(_winnow_corpus(spark, sf_dir))


def _fps_of_normalized(c: DataFrame) -> DataFrame:
    hashes = F.expr(
        f"transform(sequence(1, length(txt) - {WINNOW_K - 1}), "
        f"i -> substring(md5(substring(txt, i, {WINNOW_K})), 1, 8))"
    )
    h = c.select(
        "doc_id", F.length("txt").alias("L"), F.explode(F.array(hashes)).alias("hs")
    )
    # per-window minimum as least() over W direct lookups — no slice
    # allocation per window.
    win_min = ", ".join(f"element_at(hs, j + {o})" for o in range(WINNOW_W))
    fps = F.expr(
        f"array_distinct(transform(sequence(1, size(hs) - {WINNOW_W - 1}), "
        f"j -> least({win_min})))"
    )
    return h.select("doc_id", "L", F.explode(fps).alias("fp"))


@register(
    "dd_winnow_fingerprints",
    oracle=f"""
    WITH {_CORPUS_CTE}, {_FPS_CTE}
    SELECT doc_id, count(*) AS n_fp,
           round(CAST(count(*) AS DOUBLE) / (max(L) - {WINNOW_K + WINNOW_W - 2}), 6)
             AS fp_density
    FROM fps GROUP BY doc_id
    """,
)
def dd_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing sketch size and density (selected
    fingerprints per window position; expectation ~ 2/(w+1))."""
    return winnow_fingerprints(spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.round(
            F.count(F.lit(1)).cast("double")
            / (F.max("L") - (WINNOW_K + WINNOW_W - 2)),
            6,
        ).alias("fp_density"),
    )


@register(
    "dd_winnow_match_pairs",
    oracle=f"""
    WITH {_CORPUS_CTE}, {_FPS_CTE},
    capped AS (
      SELECT doc_id, fp FROM fps
      WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {WINNOW_DF_CAP})
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM capped GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fp
      FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT s.doc_a, s.doc_b, s.shared_fp,
           round(CAST(s.shared_fp AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
    FROM shared s
    JOIN sizes sa ON s.doc_a = sa.doc_id
    JOIN sizes sb ON s.doc_b = sb.doc_id
    WHERE s.shared_fp >= {WINNOW_MIN_SHARED}
    """,
)
def dd_winnow_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level overlap pairs: documents sharing >= 3 winnowing
    fingerprints, with a containment estimate (shared / smaller sketch).

    Finds the injected truncated copies *and* any organic boilerplate
    reuse; a shared substring of length >= k+w-1 = 11 normalized chars
    guarantees a shared fingerprint, so recall on real partial copies
    is structural, not probabilistic."""
    fp_rows = winnow_fingerprints(spark, sf_dir).select("doc_id", "fp").persist()
    # document-frequency cap — boilerplate fingerprints appearing in
    # many docs would otherwise explode the self-join. Round-10
    # optimization (guide §2.3 aggregate before you shuffle): the
    # over-cap list comes from a map-side-combining groupBy (tiny
    # output: only fps with df > cap) broadcast into an anti-join,
    # instead of shuffling + sorting EVERY (doc, fp) row through a
    # count window. Identical capped relation by construction.
    hot = (
        fp_rows.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > WINNOW_DF_CAP)
        .select("fp")
    )
    capped = (
        fp_rows.join(F.broadcast(hot), "fp", "left_anti")
        # feeds the size aggregate AND both sides of the pair self-join;
        # uncached, the per-character md5 fingerprinting (the expensive
        # subtree) would execute three times.
        .persist()
    )
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = capped.alias("a"), capped.alias("b")
    shared = (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_fp"))
        .filter(F.col("shared_fp") >= WINNOW_MIN_SHARED)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        shared.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            F.round(
                F.col("shared_fp").cast("double") / F.least("na", "nb"), 6
            ).alias("containment"),
        )
    )
