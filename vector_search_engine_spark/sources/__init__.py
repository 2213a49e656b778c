"""Raw-format sources/sinks (reference ``utils.h`` fvecs/ivecs loaders)."""

from vector_search_engine_spark.sources.fvecs import (  # noqa: F401
    scan_bvecs,
    scan_fvecs,
    scan_ivecs,
    write_bvecs,
    write_fvecs,
    write_ivecs,
)
