"""Query + oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 gets:
  * a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native plan), and
  * where SQL-expressible, a DuckDB oracle SQL string computing the same
    result over the same parquet views (tables: region nation customer
    supplier part orders lineitem events documents embeddings).

Column names and value rounding are pinned identically on both sides —
the driver hashes values after sorting columns by name (see repo README).

Conventions shared by engine and oracle:
  * distances are **squared** L2 (reference ``distance.cpp:6-13``), float64
    accumulation over float32 inputs, rounded to 4 decimals in outputs;
  * ordering/tie-break ascending ``(dist, id)`` (SURVEY.md §2.4);
  * derived query set = embeddings with ``vec_id < 20`` (FIXTURES.md).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.functions.vector import dot, norm
from vector_search_engine_spark.operators import events as ev_ops
from vector_search_engine_spark.operators import ivf
from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.operators import relational as rel_ops
from vector_search_engine_spark.operators import retrieval
from vector_search_engine_spark.operators import simjoin
from vector_search_engine_spark.operators import dedup as dedup_ops
from vector_search_engine_spark.operators import text_ops as txt_ops

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The DuckDB twin of functions.vector.l2_sq / dot (float64 accumulation).
_DD_L2SQ = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))**2))"
)
_DD_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)

_DD_QUERIES = "SELECT vec_id AS qid, embedding AS query FROM embeddings WHERE vec_id < 20"




# Names the family modules (registry/*.py) pull in with a star import —
# the shared dicts, the decorator, the DuckDB helper fragments, and the
# common imports the monolithic registry.py's sections all used.
__all__ = [
    "QUERIES", "ORACLES", "register", "QueryFn",
    "_DD_L2SQ", "_DD_DOT", "_DD_QUERIES",
    "os", "Callable", "DataFrame", "SparkSession", "F", "load_table",
    "dot", "norm", "ev_ops", "ivf", "knn_ops", "rel_ops", "retrieval",
    "simjoin", "dedup_ops", "txt_ops",
]
