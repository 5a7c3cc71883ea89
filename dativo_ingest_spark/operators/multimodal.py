"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with typed metadata — the only
sane representation at 100 TB: Spark shuffles/spills binary efficiently,
parquet stores it chunked, and partition pruning works on the metadata
columns while the bytes stay untouched until a mapInPandas stage needs them.

The decode/resize/feature kernels are STUBBED: the container has no
image/audio libraries, so each kernel either raises ``NotImplementedError``
(``engine="real"``) or produces a clearly-marked deterministic fake derived
from the bytes (``engine="fake"``, default — used by tests to prove the
Spark-side plumbing: schemas, Arrow batch shapes, partitioning). Swapping in
Pillow/librosa/pyav is a kernel-local change; the distributed plan is final.

Magic-byte sniffing and byte-level stats are real (pure expressions).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: file-format magic prefixes, hex-encoded (public file-format specs)
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("89504E47", "png"),
    ("FFD8FF", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),   # wav/avi container
    ("664C6143", "flac"),
    ("00000018667479", "mp4"),
    ("1A45DFA3", "webm"),
)

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def sniff_format(col: Column) -> Column:
    """Container format from magic bytes (pure expression; 'unknown' when
    no prefix matches)."""
    hexed = F.hex(F.substring(col, 1, 16))
    expr = F.lit("unknown")
    for prefix, fmt in reversed(MAGIC_PREFIXES):
        expr = F.when(hexed.startswith(prefix), F.lit(fmt)).otherwise(expr)
    return expr


def byte_stats(df: DataFrame, id_col: str, media_col: str) -> DataFrame:
    """(id, n_bytes, content_md5, format) — expression-only byte-level
    facts; the dedup/partitioning workhorse for raw media."""
    c = F.col(media_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.octet_length(c).cast("long").alias("n_bytes"),
        F.md5(c).alias("content_md5"),
        sniff_format(c).alias("format"),
    )


def _fake_image_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic FAKE decode: dimensions/features derived from the
    bytes. Stands in for a real decoder so tests exercise batch shape."""
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    channels = 3
    features = [((payload[i % n] if n else 0) / 255.0) for i in range(8)]
    return width, height, channels, features


def decode_images(
    df: DataFrame,
    id_col: str,
    media_col: str,
    engine: str = "fake",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Arrow-batched image decode + feature extraction.

    ``engine="real"`` is the integration point for an actual decoder and
    raises ``NotImplementedError`` in this environment. The plumbing —
    column pruning to (id, bytes), mapInPandas batch iteration, typed
    output schema — is the production path either way.
    """
    if engine not in ("fake", "real"):
        raise ValueError(f"unknown decode engine: {engine}")

    import pandas as pd  # executor-side

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if engine == "real":
                raise NotImplementedError(
                    "real image decode requires an image library absent "
                    "from this environment; use engine='fake'"
                )
            out = []
            for rid, payload in zip(pdf["id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                w, h, ch, feats = _fake_image_decode(payload)
                out.append((rid, w, h, ch, feats))
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "channels", "features"]
            )

    pruned = df.select(
        F.col(id_col).cast("string").alias("id"), F.col(media_col).alias("media")
    )
    return pruned.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_offsets(
    duration_ms: Column, every_ms: int = 1000, max_frames: int = 32
) -> Column:
    """Video frame-sampling plan as an expression: array of millisecond
    offsets to decode (the decode itself is a kernel like decode_images).
    Bounded by ``max_frames`` so a 10-hour video can't explode a row."""
    n = F.least(
        (duration_ms / every_ms).cast("int") + 1, F.lit(max_frames)
    )
    return F.when(
        duration_ms.isNull() | (duration_ms < 0), F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(F.sequence(F.lit(0), n - 1), lambda i: i.cast("bigint") * every_ms)
    )


def resize_plan(
    df: DataFrame, id_col: str, media_col: str, target: tuple[int, int],
    engine: str = "fake",
) -> DataFrame:
    """Resize stub: reuses the decode kernel and tags the target size —
    (id, width, height, channels, features, target_w, target_h)."""
    decoded = decode_images(df, id_col, media_col, engine=engine)
    return decoded.select(
        "*",
        F.lit(target[0]).alias("target_w"),
        F.lit(target[1]).alias("target_h"),
    )
