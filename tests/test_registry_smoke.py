"""Schema-drift canary: every registry query must execute on the CURRENT
driver testdata without raising.

Round-4 lesson: the driver regenerated ``events.parquet`` with a new
physical timestamp type (``timestamp[us]`` no-tz → Spark ``TIMESTAMP_NTZ``)
and five correctness rows + the whole bench died on an AnalysisException
nothing in ``tests/`` exercised against real testdata.  This module runs
ALL registry queries — the 50-slot ``_GRADE_FIRST`` grading window AND the
rotated-out families — end-to-end at sf0.001, so any physical-schema drift
or plan regression fails CI by name instead of silently losing a round.

Failure-isolated per query via parametrize; execution forced with
``count()`` (full pipeline, no driver-side row materialization).
"""

from __future__ import annotations

import pytest

from vector_search_engine_spark import registry

ALL_QUERIES = list(registry.QUERIES)


def test_readme_counts_match_registry():
    """README's operator/oracle counts are generated from the registry
    (scripts/update_readme_counts.py); hand-drift fails here."""
    import os
    import re

    readme = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "README.md",
    )
    with open(readme) as f:
        text = f.read()
    m = re.search(r"\((\d+) operators, (\d+) oracle-backed,", text)
    assert m, "README counts line not found"
    assert int(m.group(1)) == len(registry.QUERIES), (
        "README operator count drifted — run scripts/update_readme_counts.py"
    )
    assert int(m.group(2)) == len(registry.ORACLES), (
        "README oracle count drifted — run scripts/update_readme_counts.py"
    )


def test_grading_window_is_covered():
    """Every _GRADE_FIRST name must resolve to a registered query."""
    missing = [n for n in registry._GRADE_FIRST if n not in registry.QUERIES]
    assert not missing, f"_GRADE_FIRST names without a registry entry: {missing}"


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_registry_query_executes(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    # a query with an empty result on real testdata is almost always a
    # drifted filter/join — the known-empty exceptions opt out here
    known_possibly_empty = {"customers_without_orders", "events_range_join"}
    if name not in known_possibly_empty:
        assert n > 0, f"{name} returned 0 rows at sf0.001"
