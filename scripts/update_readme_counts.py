"""Regenerate the registry-derived counts in README.md from the registry
itself (r9 verdict: hand-edited counts drifted twice; this makes the
line mechanical).  Run after adding/removing registry queries:

    python scripts/update_readme_counts.py

The matching pytest (tests/test_registry_smoke.py::
test_readme_counts_match_registry) fails CI whenever README and
registry disagree, so forgetting to run this is caught.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_search_engine_spark import registry  # noqa: E402

README = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"
)


def main() -> None:
    n_queries = len(registry.QUERIES)
    n_oracles = len(registry.ORACLES)
    with open(README) as f:
        text = f.read()
    text, n1 = re.subn(
        r"\(\d+ operators, \d+ oracle-backed,",
        f"({n_queries} operators, {n_oracles} oracle-backed,",
        text,
    )
    # the sweep sentence was reworded without a literal count (r13);
    # keep rewriting it if a numbered form ever returns, but don't
    # require it
    text, n2 = re.subn(
        r"all \d+ oracle-backed queries match",
        f"all {n_oracles} oracle-backed queries match",
        text,
    )
    if n1 != 1 or n2 > 1:
        raise SystemExit(
            f"expected exactly one count line (got {n1}) and at most one "
            f"sweep sentence (got {n2}) — README structure changed, "
            "update this script"
        )
    with open(README, "w") as f:
        f.write(text)
    print(f"README counts set to {n_queries} operators / {n_oracles} oracle-backed")


if __name__ == "__main__":
    main()
