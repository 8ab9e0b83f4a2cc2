"""Oracle-checked query for the API->orders reshape (S2/S3).

Reproduces the deterministic offline feed in both engines and runs the
reshape end to end. Rows whose title misses every product keyword are
excluded: their fallback product uses xxhash64, which DuckDB lacks
(documented engine-specific divergence, SURVEY.md §7 / S3).
``ingested_at`` (wall clock) is likewise excluded from comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .api import PRODUCT_KEYWORDS, _FAKE_TITLE_WORDS, fake_posts, posts_to_orders

_N = 200

_WORD_CASE = "CASE i % 8 " + " ".join(
    f"WHEN {j} THEN '{w}'" for j, w in enumerate(_FAKE_TITLE_WORDS)
) + " END"

_PRODUCT_CASE = "CASE " + " ".join(
    f"WHEN title LIKE '%{kw}%' THEN '{product}'" for kw, product in PRODUCT_KEYWORDS
) + " END"


@register(
    "api_orders_mapping",
    oracle=f"""
    WITH posts AS (
      SELECT i,
             CAST((i - 1) % 10 + 1 AS BIGINT) AS userId,
             'post about ' || {_WORD_CASE} || ' ' || i AS title
      FROM (SELECT unnest(generate_series(1, {_N})) AS i)
      WHERE i % 8 != 7
    )
    SELECT printf('API-%04d', i)                            AS order_id,
           'Customer ' || userId                            AS customer_name,
           'customer' || userId || '@example.com'           AS customer_email,
           {_PRODUCT_CASE}                                  AS product,
           CAST(1 AS BIGINT)                                AS quantity,
           round(50 + (i % 20) * 25.99, 2)                  AS price,
           0.0                                              AS discount,
           round(50 + (i % 20) * 25.99, 2)                  AS total_amount,
           CAST(current_date AS VARCHAR)                    AS order_date,
           'api_rest'                                       AS source,
           CAST(i AS BIGINT)                                AS api_post_id
    FROM posts
    """,
)
def api_orders_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 reshape over the deterministic feed (sf-independent source
    operator; sf_dir unused by design)."""
    posts = [p for p in fake_posts(_N) if p["id"] % 8 != 7]
    return posts_to_orders(spark, posts).drop("ingested_at", "product_category")
