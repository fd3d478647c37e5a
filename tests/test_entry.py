"""Driver-contract invariants: the __spark_entry__ surface and the
registry counts the README advertises stay in lockstep with the catalog.
"""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entry_mod
from dopams_etl_spark.plans import catalog

README = Path(__file__).resolve().parents[1] / "README.md"
COVERAGE = Path(__file__).resolve().parents[1] / "COVERAGE.md"


def test_registry_counts():
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    # Every registered query carries an oracle — no rows-only remainders.
    assert set(oracles) == set(qs), sorted(set(qs) - set(oracles))
    # README's advertised count is generated from this assertion: update
    # both together.
    m = re.search(r"expose (\d+) registered", README.read_text())
    assert m, "README no longer states the registered-query count"
    assert int(m.group(1)) == len(qs), (
        f"README says {m.group(1)} queries, registry has {len(qs)}"
    )


def test_coverage_mentions_every_query():
    # The coverage map can't silently trail a registration: every
    # registered query name must appear somewhere in COVERAGE.md.
    text = COVERAGE.read_text()
    missing = sorted(n for n in catalog.queries() if n not in text)
    assert not missing, f"COVERAGE.md does not mention: {missing}"


def test_entry_module_exposes_catalog():
    assert set(entry_mod.queries()) == set(catalog.queries())
    assert set(entry_mod.oracle_sql()) == set(catalog.oracle_sql())


def test_priority_names_are_registered():
    qs = catalog.queries()
    missing = [n for n in catalog._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY lists unregistered queries: {missing}"
    assert len(set(catalog._PRIORITY)) == len(catalog._PRIORITY), "duplicate _PRIORITY entries"
