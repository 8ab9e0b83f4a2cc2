"""spark.sql over registered views produces the same plans/results as
the DataFrame API (Catalyst converges both — SURVEY.md §3 entry 3)."""

from __future__ import annotations

from scalable_data_ingestion_spark.catalog import register_views
from scalable_data_ingestion_spark.registry import queries


def test_sql_equals_dataframe_q01(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_result = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    df_result = queries()["q01_pricing_summary"](spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "sum_qty", "count_order"
    )
    assert sorted(map(tuple, sql_result.collect())) == sorted(
        map(tuple, df_result.collect())
    )


def test_all_tables_registered(spark, sf_dir):
    register_views(spark, sf_dir)
    names = {r["viewName"] for r in spark.sql("SHOW VIEWS").collect()}
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        assert t in names
    assert spark.sql("SELECT count(*) FROM embeddings").first()[0] > 0
