"""TPC-H suite tests: plan-shape assertions for the composite
decision-support queries (operators/tpch.py) plus value spot-checks
against DuckDB at smoke scale.  The full-oracle sweep
(scripts/check_oracles.py) remains the exhaustive correctness gate;
these tests pin the SCALE properties — broadcast dims, single
fact-fact exchange, pushed filters, TakeOrdered top-k — that a value
check cannot see."""

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_q3_topk_no_global_sort_and_pushed_dates(spark, queries):
    plan = _plan(queries["q63_tpch_q3"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan
    # segment filter prunes customer before its broadcast
    assert "BroadcastHashJoin" in plan, plan
    assert re.search(r"PushedFilters: \[[^\]]*c_mktsegment", plan), plan


def test_q4_exists_is_semi_join(spark, queries):
    plan = _plan(queries["q64_tpch_q4"](spark, SF_SMOKE))
    assert "LeftSemi" in plan, plan


def test_q6_all_predicates_reach_scan(spark, queries):
    plan = _plan(queries["q65_tpch_q6"](spark, SF_SMOKE))
    pushed = re.search(r"PushedFilters: \[(.+?)\]", plan)
    assert pushed, plan
    for col in ("l_discount", "l_quantity"):
        assert col in pushed.group(1), plan
    # single aggregate query: no join operator at all
    assert "Join" not in plan, plan


def test_q8_eight_table_join_broadcasts_all_dims(spark, queries):
    """The market-share join tree must contain exactly one
    non-broadcast join (lineitem⋈orders); part/supplier/customer/
    nation×2/region all broadcast."""
    plan = _plan(queries["q67_tpch_q8"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert plan.count("SortMergeJoin") <= 1, plan


def test_q13_filter_lives_in_join_not_where(spark, queries):
    """Customers with zero (non-urgent) orders must survive the left
    join — the count-0 group is the point of Q13."""
    from smartpipeline_spark import sources

    df = queries["q69_tpch_q13"](spark, SF_SMOKE)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    # the distribution partitions customers: zero-order customers are
    # retained by the left join (the ON-filter must not become WHERE)
    n_customers = sources.table(spark, "customer", SF_SMOKE).count()
    assert sum(rows.values()) == n_customers


def test_q15_max_revenue_equality_is_exact(spark, queries):
    """Q15's max-equality filter must return at least one supplier —
    an inexact (double-rounded-early) comparison returns zero rows."""
    df = queries["q71_tpch_q15"](spark, SF_SMOKE)
    assert df.count() >= 1


def test_q18_reuses_orderkey_partitioning(spark, queries):
    plan = _plan(queries["q73_tpch_q18"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan
    # the HAVING subquery and the rejoin both hash on l_orderkey: at
    # most the two fact exchanges, never a third for the semi join
    assert plan.count("Exchange hashpartitioning(l_orderkey") <= 2, plan


def test_q22_anti_join_and_broadcast_cutoff(spark, queries):
    plan = _plan(queries["q74_tpch_q22"](spark, SF_SMOKE))
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_tpch_values_match_duckdb_at_smoke(spark, queries):
    """End-to-end value equality for three representative composites
    at sf0.001 — the same comparator the driver runs at sf0.01."""
    import __spark_entry__ as entrymod

    from smartpipeline_spark.testing import compare

    oracles = entrymod.oracle_sql()
    for key in ("q65_tpch_q6", "q66_tpch_q7", "q70_tpch_q14"):
        res = compare(queries[key](spark, SF_SMOKE), oracles[key], SF_SMOKE)
        assert res["hash_match"], (key, res)


def test_derived_partsupp_invariants(spark):
    """The derived partsupp must behave like the real table: exactly 4
    DISTINCT suppliers per part (the stride is collision-free for
    S >= 5), supplier keys within range, and 2-decimal-exact
    supplycost."""
    from smartpipeline_spark import sources
    from smartpipeline_spark.operators.tpch import derived_partsupp

    ps = derived_partsupp(spark, SF_SMOKE)
    n_parts = sources.table(spark, "part", SF_SMOKE).count()
    n_supp = sources.table(spark, "supplier", SF_SMOKE).count()
    stats = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("ds"), F.count("*").alias("n")
    )
    bad = stats.filter((F.col("ds") != 4) | (F.col("n") != 4)).count()
    assert bad == 0
    assert stats.count() == n_parts
    rng = ps.agg(
        F.min("ps_suppkey").alias("lo"), F.max("ps_suppkey").alias("hi")
    ).collect()[0]
    assert rng.lo >= 0 and rng.hi < n_supp
    off_grid = ps.filter(
        F.col("ps_supplycost") * 100 != F.floor(F.col("ps_supplycost") * 100)
    ).count()
    assert off_grid == 0
