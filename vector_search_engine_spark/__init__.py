"""vector_search_engine_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of sdsasf/vector_search_engine.

The reference (C++ HNSW ANN engine, see SURVEY.md) exposes one logical table
``(id, float32[dim] vector)`` and two operations: k-NN search under squared
L2 and insert.  This package re-expresses that surface — plus the
LLM-data-pipeline operators a 100 TB training corpus needs — as idiomatic
PySpark: DataFrame/SQL plans Catalyst can optimize, Arrow-batched pandas
UDFs only where built-ins can't express the semantics.

Layout:
    functions/   scalar/array kernels (l2_sq, cosine, text n-grams…)
    operators/   knn, ivf index, dedup, text analysis, relational, events
    sources/     fvecs/ivecs ingestion (reference utils.h format)
    streaming/   delta ingest + compaction (reference engine.h LSM analog)
    multimodal/  opaque binary columns + metadata plumbing
"""

__version__ = "0.1.0"

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark, sf_dir: str, name: str):
    """Load one driver-generated parquet table (TESTDATA.md).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read it as long nanos (legacy conf) and truncate to
    microseconds — the same ns→us truncation DuckDB applies, so event-time
    values hash-match the oracle.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
