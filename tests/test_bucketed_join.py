"""Bucketed co-located join: CLUSTERED BY the join key on both sides with
matching bucket counts -> the sort-merge join needs NO Exchange on either
side (the 100 TB fact-fact join recipe when neither side broadcasts: the
shuffle of both fact tables — the dominant cost — disappears). A local
per-bucket Sort remains: Spark's bucketed scan does not trust write-time
ordering by default (spark.sql.legacy.bucketedTableScan.outputOrdering),
and an in-memory sort of one bucket's slice is cheap next to a shuffle."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("buckets"))
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    for t in ("t_orders_b", "t_customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    (o.write.format("parquet").bucketBy(4, "o_custkey").sortBy("o_custkey")
       .option("path", f"{loc}/o").mode("overwrite").saveAsTable("t_orders_b"))
    (c.write.format("parquet").bucketBy(4, "c_custkey").sortBy("c_custkey")
       .option("path", f"{loc}/c").mode("overwrite").saveAsTable("t_customer_b"))
    yield spark.table("t_orders_b"), spark.table("t_customer_b"), o, c
    for t in ("t_orders_b", "t_customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_is_exchange_free(bucketed):
    ob, cb, _, _ = bucketed
    j = ob.join(cb.hint("merge"), ob.o_custkey == cb.c_custkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: both sides pre-bucketed
    assert "Bucketed: true" in plan


def test_bucketed_join_same_answer(bucketed):
    ob, cb, o, c = bucketed
    a = (ob.join(cb.hint("merge"), ob.o_custkey == cb.c_custkey)
           .groupBy("c_mktsegment").count())
    b = (o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count())
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
