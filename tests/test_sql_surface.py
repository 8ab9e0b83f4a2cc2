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


def test_register_query_views_subset(spark, sf_dir):
    from scalable_data_ingestion_spark.catalog import register_query_views

    done = register_query_views(
        spark, sf_dir, names=["ev_qini_uplift", "q01_pricing_summary"]
    )
    assert done == ["ev_qini_uplift", "q01_pricing_summary"]
    # query views are real SQL relations: filter + join against a base
    # table view in one statement.
    rows = spark.sql(
        "SELECT count(*) AS n FROM ev_qini_uplift WHERE tile <= 3"
    ).collect()
    assert rows[0]["n"] == 3
    joined = spark.sql(
        """
        SELECT q.l_returnflag, q.sum_qty, count(*) AS n_li
        FROM q01_pricing_summary q
        JOIN lineitem l ON l.l_returnflag = q.l_returnflag
                       AND l.l_linestatus = q.l_linestatus
        GROUP BY q.l_returnflag, q.sum_qty
        """
    ).collect()
    assert len(joined) >= 3


def test_register_query_views_unknown_name(spark, sf_dir):
    import pytest

    from scalable_data_ingestion_spark.catalog import register_query_views

    with pytest.raises(KeyError):
        register_query_views(spark, sf_dir, names=["no_such_query"])


def test_register_query_views_full_registry(spark, sf_dir, registry_plans):
    # The complete SQL frontend: every registered query becomes an
    # addressable view. View registration is pure naming, so it reuses
    # the session's shared plan build (conftest registry_plans) instead
    # of rebuilding every query (and its eager training jobs) a second
    # time — round-11 suite-runtime fix.
    from scalable_data_ingestion_spark.catalog import register_query_views
    from scalable_data_ingestion_spark.registry import queries

    plans, _errors = registry_plans
    done = register_query_views(
        spark, sf_dir, prebuilt={n: df for n, (df, _s, _o) in plans.items()}
    )
    assert len(done) == len(queries())
    assert set(done) <= {
        t.name for t in spark.catalog.listTables() if t.isTemporary
    }
