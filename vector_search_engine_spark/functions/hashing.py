"""The portable salted-md5 hash family — ONE definition (r15).

Every deterministic "random" draw in the engine that a DuckDB oracle
must replay — sampling keys (A-ES, Gumbel-top-k, per-source prefix
samples), split assignment, feature-hashing buckets (TF-IDF, DSIR),
portable MinHash permutations, bottom-k overlap sketches — derives from
the SAME primitive: a salted md5 truncated to 15 hex chars (60 bits,
fits a BIGINT in Spark AND DuckDB), parsed base-16.

It lives here as a single helper because the finding-28 lesson applies
to hash discipline too: when both engines must agree bit-for-bit, the
agreement has to be STRUCTURAL (one code path) rather than
conventional (N hand-copied expression twins that can drift).  Before
r15 the expression was inlined at ~10 sites across ``dedup.py``,
``text_ops.py`` and ``retrieval.py``; all route here now.

DuckDB replay of ``salted_md5_long(col, salt)``::

    CAST(('0x' || substr(md5('<salt>' || col), 1, 15)) AS BIGINT)

The driver-side twin (``operators/lsh.py``'s hyperplane parities) uses
Python ``hashlib.md5`` to build a CONSTANT plane tensor on the driver —
same md5 family, but a scalar-constant derivation rather than a column
expression, so it intentionally stays next to its consumer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^60 as a double: divisor turning a 60-bit hash into u ∈ (0, 1]
U_DENOM = float(1 << 60)


def salted_md5_long(col: Column, salt: str = "") -> Column:
    """Salted 60-bit md5 → BIGINT — the ``weighted_sample_es`` hash
    discipline: a pure, cross-engine-reproducible function of the input
    (15 hex chars = 60 bits, fits a BIGINT in Spark AND DuckDB).
    ``col`` must already be a string column (callers cast ids
    explicitly so the bytes hashed are unambiguous); ``salt=""`` is the
    unsalted form (TF-IDF term bucketing)."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def salted_md5_unit(col: Column, salt: str = "") -> Column:
    """The same hash mapped to u ∈ (0, 1] — the uniform draw behind
    Gumbel keys and exponential sampling keys: (h + 1) / 2^60, never 0
    (a 0 would blow up log(u) consumers)."""
    return (salted_md5_long(col, salt) + 1).cast("double") / F.lit(U_DENOM)
