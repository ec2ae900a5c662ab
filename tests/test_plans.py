"""Plan-shape regression tests: the scale properties claimed in
SCALING.md must be visible in the physical plans — filter pushdown,
column pruning, broadcast joins, top-k without global sort. A code
change that silently loses one of these would pass value checks but
regress 100x at scale."""

import io
import re
from contextlib import redirect_stdout

import pytest

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


def test_filter_pushdown_reaches_scan(spark, queries):
    plan = _plan(queries["q11_agg_pricing_summary"](spark, SF_SMOKE))
    pushed = re.search(r"PushedFilters: \[(.+?)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1), plan


def test_column_pruning(spark, queries):
    plan = _plan(queries["q11_agg_pricing_summary"](spark, SF_SMOKE))
    m = re.search(r"ReadSchema: struct<(.*?)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # q11 needs exactly 7 of lineitem's 11 columns
    assert read_cols == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }, read_cols


def test_star_join_broadcasts_dims(spark, queries):
    plan = _plan(queries["q06_join_broadcast"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan


def test_topk_avoids_global_sort(spark, queries):
    plan = _plan(queries["q18_orderby_limit"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan


def test_partial_aggregation_before_exchange(spark, queries):
    plan = _plan(queries["q11_agg_pricing_summary"](spark, SF_SMOKE))
    # partial (map-side) HashAggregate must appear below the Exchange
    first_agg = plan.index("HashAggregate")
    assert "partial_sum" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_semi_join_strategy(spark, queries):
    plan = _plan(queries["q07_join_semi"](spark, SF_SMOKE))
    assert "LeftSemi" in plan, plan
