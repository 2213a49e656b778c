"""Multimodal columns: opaque binary payloads + typed metadata.

The reference has no multimodal surface (its one table is (id, float[128]) —
SURVEY.md §1.1); this package is part of the north-star LLM-pipeline
extension: treat image/audio/video as opaque ``binary`` columns with typed
metadata, and implement decode / feature-extract / frame-sample as
Arrow-batched pandas UDFs over ``mapInPandas``.

Real codec decode (PIL/libav) is STUBBED — those libs are not in this
container — behind ``decode_real`` which raises ``NotImplementedError``
unless the optional import succeeds.  The *Spark-side plumbing* (schema,
partitioning, UDF signatures, Arrow batch shapes) is real and tested via a
deterministic fake decoder.
"""

from vector_search_engine_spark.multimodal.payload import (  # noqa: F401
    attach_payload,
    decode_real,
    fake_decode_features,
    frame_embeddings,
    frame_sample,
    metadata_stats,
)
