"""DuckDB-oracle hash-match of the full declared inventory at sf0.001
(the driver runs the same check at sf0.01 — see scripts/check_oracles.py
for the dev loop at that scale)."""

import pytest

from tests.conftest import SF_SMOKE


def _registry():
    import __spark_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


QUERIES, ORACLES = _registry()


@pytest.mark.parametrize("key", sorted(ORACLES))
def test_oracle_hash_match(spark, key):
    from smartpipeline_spark.testing import compare

    res = compare(QUERIES[key](spark, SF_SMOKE), ORACLES[key], SF_SMOKE)
    assert res["hash_match"], res


@pytest.mark.parametrize("key", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_execute(spark, key):
    df = QUERIES[key](spark, SF_SMOKE)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_disc_price" in df.columns
