"""Binary-payload plumbing: attach, decode (stubbed), features, frames.

Data model (the multimodal row): ::

    doc_id       long
    media_type   string            -- image | audio | video
    payload      binary            -- opaque encoded bytes
    meta         struct<width int, height int, channels int,
                        sample_rate int, n_frames int>

Scale posture: payloads stay columnar (Parquet binary + Arrow) end-to-end;
decode/feature UDFs are ``mapInPandas`` so each task handles whole Arrow
batches and per-row Python overhead is amortized.  Feature extraction
yields fixed-width numeric columns, so downstream ops (dedup, kNN over
features) run on the JVM/vectorized paths.  At 100 TB, payload columns
dominate scan bytes — every query below selects only the columns it needs
so Parquet column pruning skips payload I/O when features/metadata suffice.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int>"
)

_MEDIA_TYPES = ("image", "audio", "video")


def attach_payload(documents: DataFrame) -> DataFrame:
    """Deterministically derive a multimodal table from ``documents``:
    payload = UTF-8 bytes of the text (a stand-in for encoded media —
    opaque to the engine either way), media_type and typed metadata keyed
    off ``doc_id``.  Pure built-in expressions (no UDF)."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in _MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    width = (F.lit(32) + (F.col("doc_id") % 8) * 16).cast("int")
    height = (F.lit(32) + (F.col("doc_id") % 5) * 16).cast("int")
    return documents.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(3)).otherwise(F.lit(1)).alias(
                "channels"
            ),
            F.lit(16000).alias("sample_rate"),
            (F.col("doc_id") % 7 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _sample_features(
    doc_id: int, media_type: str, n_bytes: int, px: np.ndarray
) -> tuple:
    """The shared post-decode feature row (moments, extremes, entropy)
    over a flat uint8 sample array — identical math for the real decode
    and ``fake_decode_features``, so the two are drop-in replacements."""
    px = np.asarray(px).ravel()
    if not len(px):
        px = np.zeros(1, dtype=np.uint8)
    if px.dtype != np.uint8:  # 16-bit audio → uint8 feature domain
        px = (
            (px.astype(np.int64) + 32768) >> 8
        ).astype(np.uint8)
    counts = np.bincount(px, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(px)
    return (
        doc_id,
        media_type,
        n_bytes,
        int(len(px)),
        round(float(px.mean()), 4),
        round(float(px.std()), 4),
        int(px.min()),
        int(px.max()),
        round(float(-(p * np.log2(p)).sum()), 4),
    )


_FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, n_samples long, "
    "mean_val double, std_val double, min_val int, max_val int, "
    "entropy_bits double"
)


def attach_real_payload(documents: DataFrame) -> DataFrame:
    """Like ``attach_payload`` but the payload is a GENUINE encoded
    image: each doc's UTF-8 text bytes, tiled/truncated to the meta
    raster (width × height × 3), encoded as binary PPM (P6) by the
    vendored codec — so ``decode_real`` exercises a real sniff → parse
    → raster round-trip end-to-end and the decoded pixel stats are a
    pure function of the text (deterministic, pytest-pinnable)."""
    from vector_search_engine_spark.multimodal import codecs

    base = attach_payload(documents).withColumn(
        "media_type", F.lit("image")
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for row in pdf.itertuples(index=False):
                meta = row.meta
                w, h = int(meta["width"]), int(meta["height"])
                raw = np.frombuffer(bytes(row.payload), dtype=np.uint8)
                if not len(raw):
                    raw = np.zeros(1, dtype=np.uint8)
                px = np.resize(raw, (h, w, 3))
                payloads.append(codecs.encode_ppm(px))
            out = pdf[["doc_id", "media_type", "meta"]].copy()
            out["payload"] = payloads
            yield out[["doc_id", "media_type", "payload", "meta"]]

    return base.mapInPandas(
        encode,
        schema=(
            f"doc_id long, media_type string, payload binary, "
            f"meta {META_SCHEMA}"
        ),
    )


def decode_real(media: DataFrame, media_type: str = "image") -> DataFrame:
    """REAL codec decode — zero native dependencies.  Payload bytes are
    sniffed and decoded by the vendored pure-Python codecs
    (``multimodal.codecs``: PPM/PGM/BMP images, RIFF PCM WAV audio —
    complete spec-faithful parsers, not fakes), then run through the
    same feature extraction and output schema as
    ``fake_decode_features`` so the two paths are drop-in replacements.
    When PIL happens to be importable it extends IMAGE coverage to
    JPEG/PNG at call time; otherwise an unsupported codec raises
    ``ValueError`` naming the magic — a genuine bad-input error, never
    a silent wrong answer.

    ``media_type``: 'image' (PPM/PGM/BMP [+ PIL formats]) or 'audio'
    (WAV PCM).  Video containers (MP4/MKV...) have no pure-Python
    decoder and are declared out of scope in SURVEY.md §7; video
    pipelines here operate on frame slices (``frame_sample``) and
    frame fingerprints instead."""
    if media_type not in ("image", "audio"):
        raise ValueError(
            f"decode_real supports media_type 'image'|'audio', got "
            f"{media_type!r} (video: see SURVEY.md §7 scope note)"
        )
    from vector_search_engine_spark.multimodal import codecs

    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                buf = bytes(row.payload)
                if media_type == "audio":
                    px, _rate = codecs.decode_wav(buf)
                else:
                    try:
                        px = codecs.decode_image(buf)
                    except ValueError:
                        if not has_pil:
                            raise
                        import io

                        from PIL import Image

                        px = np.asarray(
                            Image.open(io.BytesIO(buf)), dtype=np.uint8
                        )
                out.append(
                    _sample_features(row.doc_id, row.media_type, len(buf), px)
                )
            yield pd.DataFrame(
                out, columns=[f.split()[0] for f in _FEATURE_SCHEMA.split(", ")]
            )

    return (
        media.filter(F.col("media_type") == media_type)
        .select("doc_id", "media_type", "payload", "meta")
        .mapInPandas(extract, schema=_FEATURE_SCHEMA)
    )


def fake_decode_features(media: DataFrame) -> DataFrame:
    """Deterministic fake decode + feature extraction via ``mapInPandas``.

    'Decode' = interpret payload bytes as uint8 pixels/samples, tiled or
    truncated to ``width*height*channels`` (images/video) or left as-is
    (audio) — deterministic, so tests pin exact values.  Features are the
    ones a real pipeline computes post-decode (moments, extremes, entropy).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(row.payload), dtype=np.uint8)
                meta = row.meta
                if row.media_type in ("image", "video"):
                    need = int(meta["width"]) * int(meta["height"]) * int(
                        meta["channels"]
                    )
                    px = (
                        np.resize(buf, need)  # tile/truncate — deterministic
                        if len(buf)
                        else np.zeros(need, dtype=np.uint8)
                    )
                else:
                    px = buf if len(buf) else np.zeros(1, dtype=np.uint8)
                counts = np.bincount(px, minlength=256).astype(np.float64)
                p = counts[counts > 0] / len(px)
                out.append(
                    (
                        row.doc_id,
                        row.media_type,
                        len(buf),
                        int(len(px)),
                        round(float(px.mean()), 4),
                        round(float(px.std()), 4),
                        int(px.min()),
                        int(px.max()),
                        round(float(-(p * np.log2(p)).sum()), 4),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "n_samples",
                    "mean_val",
                    "std_val",
                    "min_val",
                    "max_val",
                    "entropy_bits",
                ],
            )

    return media.select("doc_id", "media_type", "payload", "meta").mapInPandas(
        extract,
        schema=(
            "doc_id long, media_type string, n_bytes long, n_samples long, "
            "mean_val double, std_val double, min_val int, max_val int, "
            "entropy_bits double"
        ),
    )


def frame_sample(media: DataFrame, n_frames: int | None = None) -> DataFrame:
    """Frame sampling: split each payload into ``meta.n_frames`` (or a
    fixed ``n_frames``) contiguous byte slices — the video-keyframe
    extraction shape.  One input row → n output rows; offsets/lengths are
    deterministic (= oracle-checkable), frame bytes carry a content
    fingerprint for downstream frame-level dedup."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, lens, digests = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                buf = bytes(row.payload)
                nf = n_frames if n_frames is not None else int(row.meta["n_frames"])
                nf = max(1, nf)
                flen = max(1, -(-len(buf) // nf))  # ceil
                for i in range(nf):
                    off = i * flen
                    chunk = buf[off : off + flen]
                    if not chunk:
                        break
                    ids.append(row.doc_id)
                    idxs.append(i)
                    offs.append(off)
                    lens.append(len(chunk))
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame_bytes": pd.Series(lens, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return media.select("doc_id", "payload", "meta").mapInPandas(
        sample,
        schema=(
            "doc_id long, frame_idx int, frame_offset long, "
            "frame_bytes long, frame_md5 string"
        ),
    )


def metadata_stats(media: DataFrame) -> DataFrame:
    """Per-media-type payload statistics — pure built-ins over metadata and
    ``length(payload)``; Parquet never materializes payload content for
    this plan beyond the byte count (column stats / lazy binary)."""
    return (
        media.groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.round(F.avg(F.length("payload")), 4).alias("avg_bytes"),
            F.max(F.col("meta.width")).alias("max_width"),
            F.sum(F.col("meta.n_frames").cast("long")).alias("total_frames"),
        )
        .orderBy("media_type")
    )


def frame_embeddings(frames: DataFrame, dim: int = 16) -> DataFrame:
    """Per-frame "visual embedding": the STUB for an image/video encoder
    (no codec/model libraries in this container) with the real plumbing —
    Arrow batches in, fixed-dim unit-normalized ``array<float>`` out,
    deterministic in the frame CONTENT (derived from the md5 content
    fingerprint, zero-centered so unrelated frames sit near cosine 0):
    identical frame bytes ⇒ identical embedding, which is exactly the
    contract frame-level dedup downstream needs.  ``frame_id`` packs
    (doc_id, frame_idx) into one long for the pair operators."""

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            digs = [
                bytes.fromhex(h)[:dim].ljust(dim, b"\0")
                for h in pdf["frame_md5"]
            ]
            M = np.frombuffer(b"".join(digs), dtype=np.uint8).reshape(
                len(digs), dim
            ).astype(np.float64)
            M = M - 127.5
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "frame_id": (
                        pdf["doc_id"].to_numpy(dtype=np.int64) * 4096
                        + pdf["frame_idx"].to_numpy(dtype=np.int64)
                    ),
                    "embedding": [
                        [float(x) for x in row] for row in M.astype(np.float32)
                    ],
                }
            )

    return frames.select("doc_id", "frame_idx", "frame_md5").mapInPandas(
        embed, schema="frame_id long, embedding array<float>"
    )


def resize_images(media: DataFrame, max_side: int = 8) -> DataFrame:
    """Batch image RESIZE — the remaining item of the decode /
    feature-extract / resize / frame-sample plumbing quartet (r13).
    Decode (vendored codecs), area-average downscale so the longest
    side is ≤ ``max_side`` with aspect ratio preserved (integer
    box-filter when the ratio divides evenly, else nearest-index area
    sampling — deterministic, no interpolation library), re-encode as
    binary PPM.  Images already within budget pass through
    BYTE-IDENTICAL (idempotence is pytest-pinned).

    Everything runs executor-side in ``mapInPandas`` over the binary
    column — payload bytes never visit the driver, and the output
    carries (old, new) dims + byte counts so a pipeline can audit its
    storage cut.  The thumbnail stage every multimodal training
    pipeline runs before feature extraction or contact-sheet dedup."""
    from vector_search_engine_spark.multimodal import codecs

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                buf = bytes(row.payload)
                px = codecs.decode_image(buf)
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w = px.shape[:2]
                scale = max(h, w) / float(max_side)
                if scale <= 1.0:
                    out_buf, nh, nw = buf, h, w
                else:
                    nh = max(1, int(round(h / scale)))
                    nw = max(1, int(round(w / scale)))
                    # deterministic area sampling: partition source rows/
                    # cols into nh/nw contiguous bins, mean per bin
                    ys = np.linspace(0, h, nh + 1).astype(int)
                    xs = np.linspace(0, w, nw + 1).astype(int)
                    out = np.empty((nh, nw, px.shape[2]), dtype=np.float64)
                    for i in range(nh):
                        band = px[ys[i]:max(ys[i + 1], ys[i] + 1)]
                        csum = band.mean(axis=0, dtype=np.float64)
                        for j in range(nw):
                            out[i, j] = csum[
                                xs[j]:max(xs[j + 1], xs[j] + 1)
                            ].mean(axis=0)
                    q = np.clip(np.rint(out), 0, 255).astype(np.uint8)
                    if q.shape[2] == 1:
                        out_buf = codecs.encode_pgm(q[:, :, 0])
                    else:
                        out_buf = codecs.encode_ppm(q)
                rows.append(
                    (
                        row.doc_id,
                        row.media_type,
                        out_buf,
                        int(w),
                        int(h),
                        int(nw),
                        int(nh),
                        len(buf),
                        len(out_buf),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "payload", "width", "height",
                    "new_width", "new_height", "n_bytes", "new_bytes",
                ],
            )

    return (
        media.filter(F.col("media_type") == "image")
        .select("doc_id", "media_type", "payload")
        .mapInPandas(
            shrink,
            schema=(
                "doc_id long, media_type string, payload binary, "
                "width int, height int, new_width int, new_height int, "
                "n_bytes long, new_bytes long"
            ),
        )
    )
