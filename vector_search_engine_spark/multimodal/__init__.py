"""Multimodal columns: opaque binary payloads + typed metadata.

The reference has no multimodal surface (its one table is (id, float[128]) —
SURVEY.md §1.1); this package is part of the north-star LLM-pipeline
extension: treat image/audio/video as opaque ``binary`` columns with typed
metadata, and implement decode / feature-extract / frame-sample as
Arrow-batched pandas UDFs over ``mapInPandas``.

Real codec decode needs no native libs: ``multimodal.codecs`` vendors
complete pure-Python/NumPy decoders for PPM/PGM/BMP images and RIFF PCM
WAV audio (plus matching encoders for round-trip tests), and
``decode_real`` dispatches on payload magic — PIL, when importable,
extends image coverage to JPEG/PNG at call time.  Unknown codecs raise
``ValueError`` naming the magic; video containers are declared out of
scope (SURVEY.md §7) — video pipelines operate on frame slices and
fingerprints (``frame_sample``/``frame_embeddings``).  A deterministic
fake decoder (``fake_decode_features``) remains for plumbing tests over
arbitrary bytes.
"""

from vector_search_engine_spark.multimodal.payload import (  # noqa: F401
    attach_payload,
    attach_real_payload,
    decode_real,
    fake_decode_features,
    frame_embeddings,
    frame_sample,
    metadata_stats,
    resize_images,
)
