"""The SQL front door: registry query results exposed as temp views that
spark.sql can select from, filter (with pushdown — views are lazy plans,
not materializations), and join across."""

from __future__ import annotations

from songs_etl_spark.sources.catalog import expose_query_views

SF = "/root/testdata/sf0.001"


def test_views_queryable_and_composable(spark):
    names = expose_query_views(
        spark, SF, names=("pricing_summary", "top_orders_by_revenue")
    )
    assert names == ["q_pricing_summary", "q_top_orders_by_revenue"]
    rows = spark.sql(
        "SELECT l_returnflag, sum_qty FROM q_pricing_summary WHERE l_linestatus = 'F'"
    ).collect()
    assert len(rows) > 0
    joined = spark.sql(
        """
        SELECT COUNT(*) AS n FROM q_top_orders_by_revenue t
        JOIN q_pricing_summary p ON p.l_returnflag IS NOT NULL
        """
    ).collect()
    assert joined[0]["n"] > 0


def test_view_filter_pushes_to_scan(spark):
    expose_query_views(spark, SF, names=("scan_project_filter",))
    df = spark.sql("SELECT * FROM q_scan_project_filter WHERE l_orderkey = 1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_orderkey" in plan


def test_default_exposure_excludes_streaming(spark):
    from songs_etl_spark.plans import REGISTRY
    from songs_etl_spark.sources.catalog import default_view_names

    # the FUNCTION's default list (not a locally rebuilt copy): deleting the
    # streaming-exclusion branch would fail this guard
    names = default_view_names()
    assert names, "default exposure unexpectedly empty"
    assert all(not n.startswith("streaming_") for n in names)
    assert any(n.startswith("streaming_") for n in REGISTRY), "fixture lost streaming queries"
    assert set(names) == {n for n in REGISTRY if not n.startswith("streaming_")}
    # empty tuple means NONE, not all
    assert expose_query_views(spark, SF, names=()) == []
