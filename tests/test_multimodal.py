"""Multimodal binary-column plumbing tests (north-star extension; the
reference has no media surface — SURVEY.md §1.1)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.multimodal import (
    attach_payload,
    decode_real,
    fake_decode_features,
    frame_sample,
    metadata_stats,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_payload(load_table(spark, sf_dir, "documents")).cache()


def test_payload_schema_and_determinism(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert "struct" in dict(media.dtypes)["meta"]
    a = media.orderBy("doc_id").limit(5).collect()
    b = media.orderBy("doc_id").limit(5).collect()
    assert a == b
    row = a[0]
    assert row.media_type == "image"  # doc_id 0 % 3
    assert row.meta.width == 32 and row.meta.sample_rate == 16000


def test_fake_decode_features_match_numpy(media):
    feats = {r.doc_id: r for r in fake_decode_features(media).collect()}
    for row in media.orderBy("doc_id").limit(6).collect():
        buf = np.frombuffer(bytes(row.payload), dtype=np.uint8)
        if row.media_type in ("image", "video"):
            need = row.meta.width * row.meta.height * row.meta.channels
            px = np.resize(buf, need)
        else:
            px = buf
        got = feats[row.doc_id]
        assert got.n_bytes == len(buf)
        assert got.n_samples == len(px)
        assert got.mean_val == pytest.approx(round(float(px.mean()), 4))
        assert got.min_val == int(px.min()) and got.max_val == int(px.max())


def test_frame_sample_covers_payload_exactly(media):
    frames = frame_sample(media)
    per_doc = (
        frames.groupBy("doc_id")
        .agg(
            F.sum("frame_bytes").alias("covered"),
            F.count("*").alias("nf"),
            F.min("frame_offset").alias("first_off"),
        )
        .join(media.select("doc_id", F.length("payload").alias("n_bytes"),
                           F.col("meta.n_frames").alias("want_nf")), "doc_id")
        .collect()
    )
    assert len(per_doc) > 0
    for r in per_doc:
        assert r.covered == r.n_bytes  # frames tile the payload, no gaps
        assert r.first_off == 0
        assert r.nf <= r.want_nf


def test_frame_md5_is_content_hash(spark):
    media = attach_payload(
        spark.createDataFrame([(0, "abcdefgh")], "doc_id long, text string")
    )
    rows = frame_sample(media, n_frames=2).orderBy("frame_idx").collect()
    assert [r.frame_bytes for r in rows] == [4, 4]
    assert rows[0].frame_md5 == hashlib.md5(b"abcd").hexdigest()
    assert rows[1].frame_md5 == hashlib.md5(b"efgh").hexdigest()


def test_metadata_stats_groups_all_types(media):
    rows = metadata_stats(media).collect()
    assert [r.media_type for r in rows] == ["audio", "image", "video"]
    assert all(r.total_bytes > 0 for r in rows)


_HAS_PIL = True
try:
    import PIL.Image  # noqa: F401
except ImportError:
    _HAS_PIL = False


def _media_df(spark, rows):
    from vector_search_engine_spark.multimodal.payload import META_SCHEMA

    return spark.createDataFrame(
        rows,
        "doc_id long, media_type string, payload binary, "
        f"meta {META_SCHEMA}",
    )


def test_real_decode_ppm_bmp_no_pil(spark):
    """decode_real decodes REAL image bytes with zero native deps: the
    vendored PPM and BMP codecs round-trip known pixels and the feature
    row carries their exact stats."""
    import numpy as np

    from vector_search_engine_spark.multimodal import codecs

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    media = _media_df(
        spark,
        [
            (1, "image", bytearray(codecs.encode_ppm(px)), (4, 4, 3, 0, 1)),
            (2, "image", bytearray(codecs.encode_bmp(px)), (4, 4, 3, 0, 1)),
            (3, "image", bytearray(codecs.encode_pgm(px[:, :, 0])),
             (4, 4, 1, 0, 1)),
        ],
    )
    rows = {r.doc_id: r for r in decode_real(media).collect()}
    for d in (1, 2):  # same pixels through two codecs → same features
        assert rows[d].n_samples == 48
        assert rows[d].min_val == 0 and rows[d].max_val == 47
        assert rows[d].mean_val == 23.5
    assert rows[3].n_samples == 16  # single-channel PGM plane


def test_real_decode_wav_audio(spark):
    """Audio path: RIFF PCM WAV bytes decode to their exact samples."""
    import numpy as np

    from vector_search_engine_spark.multimodal import codecs

    s = np.arange(256, dtype=np.uint8)
    media = _media_df(
        spark,
        [(7, "audio", bytearray(codecs.encode_wav(s, 16000)),
          (0, 0, 1, 16000, 1))],
    )
    row = decode_real(media, media_type="audio").collect()[0]
    assert row.n_samples == 256
    assert row.min_val == 0 and row.max_val == 255
    assert row.mean_val == 127.5
    assert row.entropy_bits == 8.0  # uniform byte histogram


def test_real_decode_unknown_codec_raises(spark):
    """An unsupported payload is a loud ValueError naming the magic —
    never a silent wrong answer (and no NotImplementedError stubs)."""
    media = _media_df(
        spark, [(1, "image", bytearray(b"\x89PNG\r\n\x1a\n...."),
                 (4, 4, 1, 0, 1))]
    )
    if _HAS_PIL:
        pytest.skip("PIL present: PNG decodes for real")
    with pytest.raises(Exception, match="unsupported media codec"):
        decode_real(media).collect()


def test_real_decode_video_out_of_scope(media):
    with pytest.raises(ValueError, match="image.*audio|SURVEY"):
        decode_real(media, media_type="video")


@pytest.mark.skipif(not _HAS_PIL, reason="container has no PIL")
def test_real_decode_with_pil(spark):
    """When PIL is importable, decode_real decodes actual image bytes and
    emits the fake_decode_features schema with real pixel stats."""
    import io

    from PIL import Image

    img = Image.new("L", (4, 4))
    img.putdata(list(range(16)))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), (4, 4, 1, 16000, 1))],
        "doc_id long, media_type string, payload binary, "
        f"meta {__import__('vector_search_engine_spark.multimodal.payload', fromlist=['META_SCHEMA']).META_SCHEMA}",
    )
    row = decode_real(media).collect()[0]
    assert row.n_samples == 16
    assert row.min_val == 0 and row.max_val == 15
    assert row.mean_val == 7.5


def test_frame_dedup_finds_replayed_payloads(spark, sf_dir):
    """Frames of replayed payloads must pair with their originals at
    cosine 1.0 through the embedding-LSH path; embeddings are
    deterministic in frame content."""
    from vector_search_engine_spark import load_table
    from vector_search_engine_spark.multimodal import (
        attach_payload,
        frame_embeddings,
        frame_sample,
    )
    from vector_search_engine_spark.operators import dedup as dedup_ops
    from pyspark.sql import functions as F

    media = attach_payload(load_table(spark, sf_dir, "documents"))
    dup = media.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    frames = frame_sample(media.unionByName(dup))
    fe = frame_embeddings(frames)
    pairs = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in dedup_ops.embedding_lsh_pairs(
            fe, threshold=0.999, id_col="frame_id", vec_col="embedding"
        ).collect()
    }
    planted = frames.filter(F.col("doc_id") >= 100000).select(
        "doc_id", "frame_idx"
    ).collect()
    assert planted
    for r in planted:
        orig = (r["doc_id"] - 100000) * 4096 + r["frame_idx"]
        copy = r["doc_id"] * 4096 + r["frame_idx"]
        assert pairs.get((orig, copy)) == 1.0, (orig, copy)


def test_real_decode_matches_fake_on_identical_raster(spark, sf_dir):
    """attach_real_payload tiles the text bytes into the (h, w, 3)
    raster before PPM-encoding, i.e. exactly fake_decode_features'
    resize for a 3-channel image — so for channels==3 docs the REAL
    sniff→parse→stats path must reproduce the fake path's pixel stats
    bit-for-bit (n_bytes differs: the real payload carries the PPM
    header)."""
    from pyspark.sql import functions as F

    from vector_search_engine_spark import load_table
    from vector_search_engine_spark.multimodal import (
        attach_payload,
        attach_real_payload,
        fake_decode_features,
    )

    docs = load_table(spark, sf_dir, "documents").limit(40)
    real = {r.doc_id: r for r in decode_real(attach_real_payload(docs)).collect()}
    fake = {
        r.doc_id: r
        for r in fake_decode_features(
            attach_payload(docs).withColumn("media_type", F.lit("image"))
        ).collect()
    }
    compared = 0
    for d, f in fake.items():
        if d % 2 == 0:  # meta.channels == 3 → identical raster
            r = real[d]
            for c in ("n_samples", "mean_val", "std_val", "min_val",
                      "max_val", "entropy_bits"):
                assert getattr(r, c) == getattr(f, c), (d, c)
            compared += 1
    assert compared >= 10


def test_resize_images_roundtrip_and_idempotence(spark):
    """r13: area-downscale resize — exact means on evenly-divisible
    bins (hand-computable 4x2 -> 2x1 case), aspect-ratio + budget
    invariants on real payloads, byte-identical pass-through for
    images already within budget."""
    import pandas as pd

    from vector_search_engine_spark.multimodal import codecs, resize_images

    # exact case: 4 wide x 2 high, max_side=2 -> 2x1; each output pixel
    # is the mean of a 2x2 block
    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    want = np.rint(
        np.stack(
            [px[:, :2].mean(axis=(0, 1)), px[:, 2:].mean(axis=(0, 1))]
        )
    ).astype(np.uint8)[None, :, :]
    small = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "media_type": ["image", "image"],
                "payload": [
                    bytearray(codecs.encode_ppm(px)),
                    bytearray(codecs.encode_ppm(small)),
                ],
            }
        )
    )
    rows = {
        r.doc_id: r
        for r in resize_images(media, max_side=2).collect()
    }
    got = codecs.decode_image(bytes(rows[0].payload))
    assert got.shape == (1, 2, 3)
    assert (got == want).all()
    assert (rows[0].width, rows[0].height) == (4, 2)
    assert (rows[0].new_width, rows[0].new_height) == (2, 1)
    assert rows[0].new_bytes < rows[0].n_bytes
    # within budget -> byte-identical pass-through
    assert bytes(rows[1].payload) == codecs.encode_ppm(small)
    assert (rows[1].new_width, rows[1].new_height) == (2, 2)


def test_resize_images_real_payload_invariants(spark, sf_dir):
    from vector_search_engine_spark.multimodal import (
        attach_real_payload,
        codecs,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = attach_real_payload(docs)
    out = resize_images(media, max_side=8).collect()
    assert len(out) == 20
    for r in out:
        assert max(r.new_width, r.new_height) <= 8
        # aspect preserved within integer rounding
        assert abs(
            r.new_width / r.new_height - r.width / r.height
        ) <= 1.0
        px = codecs.decode_image(bytes(r.payload))
        assert px.shape[:2] == (r.new_height, r.new_width)
