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
    if multimodal.pillow_available():
        pytest.skip("Pillow installed: engine='real' resolves to it")
    # absent Pillow: fail fast on the DRIVER at plan build, not mid-job
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.decode_images(media, "id", "media", engine="real")
    with pytest.raises(NotImplementedError, match="Pillow"):
        multimodal.decode_images(media, "id", "media", engine="pillow")
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


def _wav_bytes(freq_frames=8000, rate=8000, channels=1, width=2,
               amplitude=0.5):
    """Synthesize a 1-second PCM WAV (stdlib only): constant-amplitude
    square wave so RMS == peak == amplitude exactly."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        a = int(amplitude * (2 ** (8 * width - 1)))
        frames = b"".join(
            struct.pack("<h", a if (i // 4) % 2 == 0 else -a) * channels
            for i in range(freq_frames))
        w.writeframes(frames)
    return buf.getvalue()


def _ppm_bytes(width=4, height=2, maxval=255):
    """P6 RGB image with a comment header; pixel k has intensity k*16."""
    header = f"P6\n# test image\n{width} {height}\n{maxval}\n".encode()
    pix = bytes((i * 16) % 256 for i in range(width * height * 3))
    return header + pix


def test_decode_wav_real(spark):
    from dativo_ingest_spark.operators import multimodal as mm

    wav = _wav_bytes()
    df = spark.createDataFrame(
        [("a", wav), ("b", b"not audio at all")],
        "doc_id string, media binary")
    got = {r.id: r for r in mm.decode_audio(df, "doc_id", "media").collect()}
    a = got["a"]
    assert (a.channels, a.sample_rate, a.n_frames) == (1, 8000, 8000)
    assert a.duration_ms == 1000
    assert abs(a.rms - 0.5) < 1e-4 and abs(a.peak - 0.5) < 1e-4
    b = got["b"]
    assert b.sample_rate is None and b.rms is None  # non-WAV → nulls


def test_decode_netpbm_real(spark):
    from dativo_ingest_spark.operators import multimodal as mm

    ppm = _ppm_bytes()
    df = spark.createDataFrame(
        [("img", ppm), ("junk", b"\x00\x01")],
        "doc_id string, media binary")
    got = {r.id: r for r in
           mm.decode_images(df, "doc_id", "media",
                            engine="netpbm").collect()}
    img = got["img"]
    assert (img.width, img.height, img.channels) == (4, 2, 3)
    # 24 samples of intensity k*16/255: exact mean
    exp_mean = sum((i * 16) % 256 for i in range(24)) / 24 / 255
    assert abs(img.features[0] - exp_mean) < 1e-5
    assert abs(sum(img.features[1:]) - 1.0) < 1e-6  # histogram sums to 1
    assert got["junk"].width is None

    # 16-bit P5 grayscale exercises the >u2 path
    p5 = b"P5\n2 2\n65535\n" + (b"\xff\xff" b"\x00\x00") * 2
    df2 = spark.createDataFrame([("g", p5)], "doc_id string, media binary")
    g = mm.decode_images(df2, "doc_id", "media", engine="netpbm").first()
    assert (g.width, g.height, g.channels) == (2, 2, 1)
    assert abs(g.features[0] - 0.5) < 1e-5


def test_pillow_netpbm_decode_parity(spark):
    """Pillow and the dependency-free netpbm kernel agree byte-for-byte on
    a P6 fixture (same dims/channels and feature vector) — the contract
    that makes the engines swappable. Skipped where Pillow is absent."""
    pytest.importorskip("PIL")
    from dativo_ingest_spark.operators import multimodal as mm

    ppm = _ppm_bytes()
    df = spark.createDataFrame([("img", ppm), ("junk", b"\x00\x01")],
                               "doc_id string, media binary")
    via_pillow = {r.id: r for r in
                  mm.decode_images(df, "doc_id", "media",
                                   engine="pillow").collect()}
    via_netpbm = {r.id: r for r in
                  mm.decode_images(df, "doc_id", "media",
                                   engine="netpbm").collect()}
    p, n = via_pillow["img"], via_netpbm["img"]
    assert (p.width, p.height, p.channels) == (n.width, n.height, n.channels)
    assert p.features == pytest.approx(n.features, abs=1e-6)
    assert via_pillow["junk"].width is None


def test_decode_pillow_kernel_direct():
    """Kernel-level parity without Spark (also covers the PNG path when
    Pillow is present)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from dativo_ingest_spark.operators import multimodal as mm

    ppm = _ppm_bytes()
    got = mm.decode_pillow(ppm)
    exp = mm.decode_netpbm(ppm)
    assert got == exp
    # PNG roundtrip: same pixels through a format netpbm can't read
    buf = io.BytesIO()
    Image.open(io.BytesIO(ppm)).save(buf, format="PNG")
    png = mm.decode_pillow(buf.getvalue())
    assert png[:3] == exp[:3]
    assert png[3] == pytest.approx(exp[3], abs=1e-6)
    assert mm.decode_pillow(b"not an image") is None


class TestResizeImages:
    def test_nearest_neighbor_roundtrip(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        src = _ppm_bytes(width=4, height=4)
        df = spark.createDataFrame(
            [("a", src), ("b", b"not an image")],
            "doc_id string, media binary")
        got = {r.id: r for r in
               mm.resize_images(df, "doc_id", "media", (2, 2)).collect()}
        a = got["a"]
        assert (a.width, a.height, a.channels) == (4, 4, 3)
        rz = bytes(a.resized)
        # the resized payload is itself a decodable netpbm at 2x2
        dec = mm.decode_netpbm(rz)
        assert dec is not None and dec[:3] == (2, 2, 3)
        # nearest-neighbor: top-left target pixel == source pixel (0,0)
        src_dec_pix = _ppm_bytes(width=4, height=4)[-48:][:3]
        assert rz[-12:][:3] == src_dec_pix
        assert got["b"].resized is None and got["b"].width is None

    def test_upscale(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        src = _ppm_bytes(width=2, height=2)
        df = spark.createDataFrame([("a", src)],
                                   "doc_id string, media binary")
        r = mm.resize_images(df, "doc_id", "media", (4, 4)).first()
        dec = mm.decode_netpbm(bytes(r.resized))
        assert dec[:3] == (4, 4, 3)

    def test_validates_target(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        df = spark.createDataFrame([("a", b"")],
                                   "doc_id string, media binary")
        with pytest.raises(ValueError):
            mm.resize_images(df, "doc_id", "media", (0, 2))


class TestResampleAudio:
    def test_downsample_preserves_square_wave_stats(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        wav = _wav_bytes(freq_frames=8000, rate=8000)
        df = spark.createDataFrame(
            [("a", wav), ("b", b"junk")], "doc_id string, media binary")
        got = {r.id: r for r in mm.resample_audio(
            df, "doc_id", "media", target_rate=4000).collect()}
        a = got["a"]
        assert (a.orig_rate, a.target_rate) == (8000, 4000)
        assert a.n_samples == 4000
        # square wave: linear interp lands mostly on plateaus; RMS stays
        # near the 0.5 amplitude and peak is exactly on a plateau sample
        assert 0.4 <= a.rms <= 0.55 and 0.45 <= a.peak <= 0.5
        assert got["b"].n_samples is None

    def test_identity_rate_is_lossless_stats(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        wav = _wav_bytes(freq_frames=1000, rate=8000, amplitude=0.25)
        df = spark.createDataFrame([("a", wav)],
                                   "doc_id string, media binary")
        r = mm.resample_audio(df, "doc_id", "media",
                              target_rate=8000).first()
        assert r.n_samples == 1000
        assert abs(r.peak - 0.25) < 0.01


class TestDhash:
    """Perceptual dHash over the real netpbm decode path."""

    @staticmethod
    def _p5(pixels, w=16, h=16):
        return (f"P5\n{w} {h}\n255\n".encode()
                + bytes(pixels))

    def test_brightness_invariance_and_p6_luma(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        base = [(i * 7 + 3) % 250 for i in range(256)]
        shifted = [min(p + 4, 255) for p in base]
        # P6 twin: each gray pixel expanded to RGB with distinct
        # channels whose ITU-601 integer luma equals the P5 value
        rgb = []
        for p in base:
            rgb += [p, p, p]
        rows = [
            ("a", self._p5(base)),
            ("b", self._p5(shifted)),
            ("c", b"P6\n16 16\n255\n" + bytes(rgb)),
            ("junk", b"notanimage"),
        ]
        df = spark.createDataFrame(rows, "id string, media binary")
        got = {r.id: (r.dhash_hi, r.dhash_lo)
               for r in mm.dhash_images(df, "id", "media").collect()}
        assert got["a"] == got["b"]            # uniform shift invariant
        assert got["a"] == got["c"]            # P6 luma == P5 gray
        assert got["junk"] == (None, None)

    def test_pairs_exact_at_small_hamming(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        base = [(i * 13 + 1) % 256 for i in range(256)]
        flipped = list(base)
        # flip ONE comparison: make grid cell (0,1) dip below (0,0)
        flipped[0] = 255
        rows = [("x", self._p5(base)), ("y", self._p5(flipped)),
                ("z", self._p5([(i * 101 + 7) % 256 for i in range(256)]))]
        df = spark.createDataFrame(rows, "id string, media binary")
        h = mm.dhash_images(df, "id", "media")
        pairs = {(r.id_a, r.id_b): r.hamming
                 for r in mm.dhash_neardup_pairs(h, max_dist=3).collect()}
        assert ("x", "y") in pairs and pairs[("x", "y")] <= 3
        assert all("z" not in k for k in pairs)

    def test_validation(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators import multimodal as mm

        df = spark.createDataFrame([("a", b"P5\n2 2\n255\nabcd")],
                                   "id string, media binary")
        with _pytest.raises(ValueError, match="grid"):
            mm.dhash_images(df, "id", "media", grid_w=9, grid_h=9)
        with _pytest.raises(ValueError, match="max_dist"):
            mm.dhash_neardup_pairs(mm.dhash_images(df, "id", "media"),
                                   max_dist=65)

    def test_hot_band_guard_bounds_candidates(self, spark):
        # a constant-image flood: hundreds of IDENTICAL hashes make all
        # four of their band cells hot — without the guard that's
        # ~N^2/2 candidate pairs from one cell (AQE splits partitions
        # but cannot cut the quadratic pair count within a band value).
        # The guard must drop the degenerate cells while a near-dup
        # pair below the cap keeps its exact <= 3 recall.
        from dativo_ingest_spark.operators import multimodal as mm

        flood_hash = 0x1111_2222_3333_4444
        pair_hi = 0x5A5A_6B6B
        rows = ([(f"f{i:04d}", flood_hash >> 32, flood_hash & 0xFFFFFFFF)
                 for i in range(300)]
                + [("p1", pair_hi, 0x7C7C_8D8D),
                   ("p2", pair_hi, 0x7C7C_8D8C)])   # 1 bit apart
        h = spark.createDataFrame(
            rows, "id string, dhash_hi long, dhash_lo long")

        stats = {}
        pairs = mm.dhash_neardup_pairs(
            h, max_dist=3, max_band_size=100, stats=stats).collect()
        assert stats["hot_keys"] == 4            # the flood's 4 cells
        got = {(r.id_a, r.id_b): r.hamming for r in pairs}
        assert got == {("p1", "p2"): 1}          # bounded + exact below cap

        # below the cap nothing is cut: same frame, generous cap
        stats2 = {}
        all_pairs = mm.dhash_neardup_pairs(
            h, max_dist=3, max_band_size=100_000, stats=stats2)
        assert stats2["hot_keys"] == 0
        assert all_pairs.count() == 300 * 299 // 2 + 1


class TestAudioFingerprint:
    @staticmethod
    def _wav(samples, rate=8000, channels=1):
        import io
        import struct
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(struct.pack("<%dh" % len(samples), *samples))
        return buf.getvalue()

    def test_gain_invariance_and_stereo_mixdown(self, spark):
        from dativo_ingest_spark.operators import multimodal as mm

        base = [((i * 37) % 800) - 400 for i in range(330)]
        double = [v * 2 for v in base]
        # stereo whose per-frame channel sum equals the doubled mono
        stereo = []
        for v in double:
            stereo += [v - 3, 3]
        rows = [("a", self._wav(base)), ("b", self._wav(double)),
                ("c", self._wav(stereo, channels=2)),
                ("junk", b"RIFFnope")]
        df = spark.createDataFrame(rows, "id string, media binary")
        got = {r.id: r.fingerprint for r in mm.audio_fingerprints(
            df, "id", "media").collect()}
        assert got["a"] == got["b"]            # uniform gain
        assert got["b"] == got["c"]            # integer mono mixdown
        assert got["junk"] is None

    def test_contour_bits_hand_checked(self, spark):
        from dativo_ingest_spark.operators.multimodal import (
            audio_fingerprint_bits)

        # 3 frames of 2 samples (n_frames=2): energies 2, 8, 0
        payload = self._wav([1, 1, 2, 2, 0, 0])
        n, fp = audio_fingerprint_bits(payload, n_frames=2)
        assert n == 6
        assert fp == 0b01       # rise 2->8 sets bit0; fall 8->0 clears

    def test_validation_and_short_audio(self, spark):
        import pytest as _pytest

        from dativo_ingest_spark.operators import multimodal as mm
        from dativo_ingest_spark.operators.multimodal import (
            audio_fingerprint_bits)

        assert audio_fingerprint_bits(self._wav([1, 2]), 32) is None
        df = spark.createDataFrame([("a", self._wav([0] * 40))],
                                   "id string, media binary")
        with _pytest.raises(ValueError, match="n_frames"):
            mm.audio_fingerprints(df, "id", "media", n_frames=63)
