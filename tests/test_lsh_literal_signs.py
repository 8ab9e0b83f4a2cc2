"""Round-10: the SRP-LSH literal sign matrix is value-identical to the
SQL md5 CASE it replaced (operators/dedup._plane_signs_py).

The Spark-side projection fold used to evaluate
``md5(CAST(h AS STRING) || ':' || CAST(d AS STRING))`` per row (24x64
calls per vector); the signs are a pure function of the literal (h, d)
and now ride as one constant-folded array literal. This test pins the
precomputation against the SQL CASE (still used verbatim by the DuckDB
oracle), and pins the end-to-end signature relation against the md5
formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scalable_data_ingestion_spark.operators.dedup import (
    EMB_LSH_PLANES,
    _plane_sign,
    _plane_signs_py,
    _plane_signs_sql,
)


def test_plane_signs_match_sql_case(spark):
    signs = _plane_signs_py()
    rows = spark.sql(
        "SELECT h, d, "
        + _plane_sign("h", "d")
        + " AS s FROM (SELECT explode(sequence(0, {0})) AS h) "
        "LATERAL VIEW explode(sequence(0, 63)) t AS d".format(
            EMB_LSH_PLANES - 1
        )
    ).collect()
    assert len(rows) == EMB_LSH_PLANES * 64
    for r in rows:
        assert signs[r.h][r.d] == r.s, (r.h, r.d)


def test_literal_fold_bit_equal_to_md5_fold(spark, sf_dir):
    from scalable_data_ingestion_spark.operators.dedup import _emb_corpus

    corpus = _emb_corpus(spark, sf_dir).limit(100)
    md5_expr = (
        f"transform(sequence(0, {EMB_LSH_PLANES - 1}), h -> "
        f"aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE), (acc, d) -> "
        f"acc + emb[d] * ({_plane_sign('h', 'd')})))"
    )
    lit_expr = (
        f"transform(sequence(0, {EMB_LSH_PLANES - 1}), h -> "
        f"aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE), (acc, d) -> "
        f"acc + emb[d] * element_at(element_at({_plane_signs_sql()}, h + 1), d + 1)))"
    )
    rows = corpus.select(
        F.expr(md5_expr).alias("m"), F.expr(lit_expr).alias("l")
    ).collect()
    assert rows
    import struct

    for r in rows:
        assert len(r.m) == len(r.l) == EMB_LSH_PLANES
        for a, b in zip(r.m, r.l):
            assert struct.pack("<d", a) == struct.pack("<d", b), (a, b)
