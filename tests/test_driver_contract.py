"""Driver-contract invariants: every query has an oracle, names are
stable, and the entry point is wired to a registered query."""

import __spark_entry__ as entry_mod

from recon_spark.queries import ORACLES, QUERIES


def test_registry_alignment():
    assert set(QUERIES) == set(ORACLES)
    assert len(QUERIES) >= 49
    for name, fn in QUERIES.items():
        assert callable(fn), name
        assert isinstance(ORACLES[name], str) and ORACLES[name].strip(), name


def test_entry_module_contract():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(q) == set(QUERIES)
    assert set(o) == set(ORACLES)
