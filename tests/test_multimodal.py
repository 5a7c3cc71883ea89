"""Multimodal plumbing: magic sniffing, byte stats, fake decode kernel
shape, frame-sample planning, simhash dedup operator."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dativo_ingest_spark.operators import dedup, multimodal
from dativo_ingest_spark.queries import load
from tests.conftest import SF_DIR

PNG = bytes.fromhex("89504E47") + b"restofpng"
JPEG = bytes.fromhex("FFD8FFE0") + b"jfif"
WAV = b"RIFF" + b"\x00" * 8


@pytest.fixture()
def media(spark):
    rows = [(1, bytearray(PNG)), (2, bytearray(JPEG)), (3, bytearray(WAV)),
            (4, bytearray(b"plain text bytes")), (5, None)]
    return spark.createDataFrame(rows, "id bigint, media binary")


def test_sniff_and_byte_stats(spark, media):
    got = {r.id: r for r in
           multimodal.byte_stats(media, "id", "media").collect()}
    assert got[1].format == "png"
    assert got[2].format == "jpeg"
    assert got[3].format == "riff"
    assert got[4].format == "unknown"
    assert got[1].n_bytes == len(PNG)
    import hashlib
    assert got[2].content_md5 == hashlib.md5(JPEG).hexdigest()
    assert got[5].n_bytes is None and got[5].format == "unknown"


def test_fake_decode_batch_shape(spark, media):
    out = multimodal.decode_images(media, "id", "media")
    assert [f.name for f in out.schema.fields] == [
        "id", "width", "height", "channels", "features"]
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 5
    assert all(len(r.features) == 8 for r in rows.values())
    # deterministic: same bytes → same fake features
    again = {r.id: r for r in
             multimodal.decode_images(media, "id", "media").collect()}
    assert rows["1"].features == again["1"].features
    assert rows["1"].width == 16 + len(PNG) % 64


def test_real_engine_raises(spark, media):
    with pytest.raises(Exception) as ei:
        multimodal.decode_images(media, "id", "media", engine="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)
    with pytest.raises(ValueError):
        multimodal.decode_images(media, "id", "media", engine="nope")


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame(
        [(1, 3500), (2, 0), (3, None), (4, 999_999_999)],
        "id bigint, duration_ms bigint")
    got = {r.id: r.offsets for r in df.select(
        "id", multimodal.frame_sample_offsets(
            F.col("duration_ms"), every_ms=1000, max_frames=5
        ).alias("offsets")).collect()}
    assert got[1] == [0, 1000, 2000, 3000]
    assert got[2] == [0]
    assert got[3] == []
    assert got[4] == [0, 1000, 2000, 3000, 4000]  # capped at max_frames


def test_resize_plan_tags_target(spark, media):
    out = multimodal.resize_plan(media, "id", "media", target=(224, 224))
    r = out.first()
    assert r.target_w == 224 and r.target_h == 224


def test_simhash_identical_docs_zero_hamming(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, text), (2, text),
            (3, "completely different words about spark shuffles and joins "
                "and state stores everywhere")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             dedup.simhash_pairs(df, "doc_id", "text").collect()}
    assert pairs == {(1, 2): 0}
    sigs = {r.id: r.simhash for r in
            dedup.simhash_signatures(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2] and len(sigs[1]) == 32
    assert sigs[1] != sigs[3]


def test_simhash_short_docs_filtered(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "")],
                               "doc_id bigint, text string")
    assert dedup.simhash_signatures(df, "doc_id", "text").count() == 0


def test_connected_components_chain(spark):
    # chain 1-2-3-4-5 plus isolated pair (10,11): multi-hop propagation
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "id_a bigint, id_b bigint")
    comp = {r.id: r.component for r in
            dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_corpus_keeps_survivors_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 9)], "doc_id bigint, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    out = sorted(r.doc_id for r in
                 dedup.dedup_corpus(docs, pairs, "doc_id").collect())
    assert out == [1, 7, 9]  # 2,3 collapse into component 1; singletons stay
