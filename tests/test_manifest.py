"""Dead-man's switch for the attestation surface.

The driver hash-checks only the first 50 registry keys (_WINDOW);
everything else relies on the dev sweep (scripts/check_oracles.py,
which iterates the FULL registry) plus, for rows-only keys, a named
pytest. These tests make silent de-attestation impossible: every key
must carry an oracle or a manifest entry naming a test that still
exists, and the registry the sweep iterates must be the complete
union of both query registries.
"""

import re
from pathlib import Path

import __spark_entry__ as entrymod
from conftest import SF_SMOKE

TESTS_DIR = Path(__file__).parent


def _all_test_function_names() -> set[str]:
    names = set()
    for p in TESTS_DIR.glob("test_*.py"):
        names |= set(re.findall(r"^def (test_\w+)\(", p.read_text(), re.M))
    return names


def test_every_key_is_oracled_or_manifested():
    keys = set(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    manifested = set(entrymod.ROWS_ONLY_ATTESTATIONS)
    unattested = keys - oracled - manifested
    assert not unattested, f"keys with no oracle and no attestation: {sorted(unattested)}"
    # a manifest entry for an oracled key would hide an oracle
    # regression behind a weaker check; keep the two sets disjoint
    both = oracled & manifested
    assert not both, f"keys both oracled and manifested: {sorted(both)}"
    # and no stale manifest entries for unregistered keys
    stale = manifested - keys
    assert not stale, f"manifest names unregistered keys: {sorted(stale)}"


def test_manifest_tests_exist():
    have = _all_test_function_names()
    for key, tests in entrymod.ROWS_ONLY_ATTESTATIONS.items():
        missing = [t for t in tests if t not in have]
        assert not missing, f"{key}: attestation tests not found: {missing}"


def test_window_outputs_are_driver_canonicalizable(spark):
    """The driver canonicalizes results with pandas ``sort_values``,
    which raises ``TypeError: unhashable type`` on array/map/struct
    cells — round 4 lost two otherwise-correct window rows to exactly
    this. Pin it: every _WINDOW key's output schema must be flat
    (registered queries stringify arrays; library functions keep
    returning real arrays)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    qs = entrymod.queries()
    offenders = {}
    for key in entrymod._WINDOW:
        schema = qs[key](spark, SF_SMOKE).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, (
        f"window keys with non-flat output columns (driver pandas "
        f"canonicalizer cannot sort these): {offenders}"
    )


def test_window_oracles_emit_no_hugeint_or_nested_types():
    """DuckDB HUGEINT reaches the driver's pandas canonicalizer as
    float64 ('65994.0' vs Spark's '65994' — the round-4
    ext_export_shards red row), and list/struct cells crash its sort.
    Pin it: every _WINDOW oracle, executed on sf0.001, must return
    only flat, pandas-faithful column types (CAST SUM arithmetic to
    BIGINT; array_to_string list outputs)."""
    from smartpipeline_spark.testing import duckdb_connection

    con = duckdb_connection(SF_SMOKE)
    oracles = entrymod.oracle_sql()
    offenders = {}
    for key in entrymod._WINDOW:
        if key not in oracles:
            continue
        rel = con.sql(oracles[key])
        bad = [
            f"{name}: {t}"
            for name, t in zip(rel.columns, map(str, rel.types))
            if "HUGEINT" in str(t).upper()
            or "[]" in str(t)
            or "STRUCT" in str(t).upper()
            or "MAP" in str(t).upper()
        ]
        if bad:
            offenders[key] = bad
    assert not offenders, (
        f"window oracles with HUGEINT/nested output types (pandas "
        f"renders these unfaithfully for the driver compare): {offenders}"
    )


def test_registry_is_the_full_union_no_key_dropped():
    """queries() must expose EVERY registered key — the sweep iterates
    queries(), so a key dropped by the window-ordering logic would
    fall out of all checking at once."""
    from smartpipeline_spark.functions import EXT_QUERIES
    from smartpipeline_spark.operators import QUERIES

    assert set(entrymod.queries()) == set(QUERIES) | set(EXT_QUERIES)
    # and the window is a strict prefix of it (driver contract)
    assert tuple(entrymod.queries())[: len(entrymod._WINDOW)] == entrymod._WINDOW


import pytest


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_html_oracle_corpus_assumptions_hold(sf):
    """The ext_html_extract / ext_html_boilerplate closed-form oracles
    assume the fixture corpus: (a) documents.text and documents.lang
    contain ONLY ASCII whitespace [\\t\\n\\f\\r ] (DuckDB/RE2 '\\s+'
    vs Python str.split() diverge on \\x0b, \\x1c-\\x1f, \\x85 and
    Unicode spaces), (b) both are <,>,&-free (the synth HTML embeds
    them raw), (c) lang is never empty/whitespace-only (the
    boilerplate CASE relies on it). This test turns a silent
    engine-divergence on a fixture change into a loud failure —
    checked over the FULL fixture ladder (the oracles are graded at
    sf0.01 by the driver and sf0.1 by the sweep, not just SF_SMOKE;
    ADVICE r10)."""
    import duckdb

    con = duckdb.connect()
    bad = con.sql(
        f"""
        SELECT count(*) FROM read_parquet('/root/testdata/{sf}/documents.parquet')
        WHERE regexp_matches(text, '[<>&\\x0b\\x1c-\\x1f\\x{{85}}\\x{{a0}}\\x{{1680}}\\x{{2000}}-\\x{{200a}}\\x{{2028}}\\x{{2029}}\\x{{202f}}\\x{{205f}}\\x{{3000}}]')
           OR regexp_matches(lang, '[<>&\\x0b\\x1c-\\x1f\\x{{85}}\\x{{a0}}\\x{{1680}}\\x{{2000}}-\\x{{200a}}\\x{{2028}}\\x{{2029}}\\x{{202f}}\\x{{205f}}\\x{{3000}}]')
           OR trim(lang, E' \\t\\n\\f\\r') = ''
           OR lang IS NULL
        """
    ).fetchone()[0]
    assert bad == 0, (
        f"{bad} documents rows violate the html-oracle corpus "
        "assumptions (exotic whitespace, <>&, or empty lang) — the "
        "closed-form oracles in functions/markup.py no longer hold"
    )
