from vector_search_engine_spark.functions.vector import (  # noqa: F401
    cosine_sim,
    dot,
    l2_sq,
    norm,
    normalize,
)
