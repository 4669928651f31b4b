"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns plus typed metadata structs —
the only layout that scales: bytes stay columnar in parquet/Arrow, no
JVM object blowup, and partition sizing is driven by byte size, not row
count. Decode/feature kernels run as Arrow-batched ``mapInPandas`` so
each Python worker touches a whole batch of byte buffers at once.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode_image`` raises unless given ``fake=True``, which produces a
deterministic metadata-shaped feature row — the Spark-side contract
(schemas, batching, partitioning) is real and tested; the kernel body
is the only stub.  Reference parity note: the reference has no media
handling at all; this is north-star surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "feature array<float>"
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Stub decode: real pipelines plug PIL/torchvision here."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic test kernel"
        )
    # Deterministic 8-dim 'feature': normalized bytes of the sha256 digest.
    digest = hashlib.sha256(payload).digest()[:8]
    return [b / 255.0 for b in digest]


def extract_features(media: DataFrame, fake: bool = True, batch_rows: int = 1024) -> DataFrame:
    """binary → feature vectors via Arrow-batched mapInPandas.

    Partitioning contract: upstream should repartition by byte volume
    (``repartitionByRange`` on a size column) so one straggler video
    doesn't serialize a whole partition's decode.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # null payloads quarantine (null stats/feature) rather than
            # failing the task — same contract as image_dimensions
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "feature": pdf["payload"].map(
                        lambda b: decode_image(bytes(b), fake=fake)
                        if b is not None
                        else None
                    ),
                }
            )
            yield out

    return media.mapInPandas(_kernel, schema=FEATURE_SCHEMA)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_dims(b: bytes) -> tuple[str, int, int] | None:
    """REAL (codec-free) image header parsing: (mime, width, height)
    from raw bytes for PNG / JPEG / GIF, or None if unrecognized or
    truncated. Container formats put dimensions in fixed header fields,
    so no decoder is needed — this is the working counterpart to the
    stubbed pixel-decode kernel.

    - PNG: IHDR chunk is mandatory-first; width/height are big-endian
      u32 at offsets 16/20.
    - JPEG: walk the marker stream to the first SOF0-SOF15 frame header
      (skipping DHT/JPG/DAC); height/width are big-endian u16 at
      payload offsets 3/5.
    - GIF: width/height are little-endian u16 at offsets 6/8.
    """
    if b.startswith(_PNG_SIG) and len(b) >= 24 and b[12:16] == b"IHDR":
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        return ("image/png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        return ("image/gif", w, h)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None  # corrupt marker stream
            if b[i + 1] == 0xFF:
                i += 1  # optional 0xFF fill bytes before a marker (T.81 B.1.1.2)
                continue
            marker = b[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone marker, no length
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if marker in _SOF_MARKERS:
                if i + 9 <= len(b):
                    h = int.from_bytes(b[i + 5 : i + 7], "big")
                    w = int.from_bytes(b[i + 7 : i + 9], "big")
                    return ("image/jpeg", w, h)
                return None
            i += 2 + seg_len
        return None
    return None


DIMS_SCHEMA = "media_id bigint, mime string, width int, height int"


def image_dimensions(media: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """(media_id, mime, width, height) via Arrow-batched header parsing
    — rows whose payload isn't a recognizable PNG/JPEG/GIF get nulls
    (quarantine-friendly: filter ``mime IS NULL`` to a reject sink).
    Cost is O(header bytes) per row regardless of media size."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf[payload_col].map(
                lambda x: (
                    (parse_image_dims(bytes(x)) or (None, None, None))
                    if x is not None
                    else (None, None, None)
                )
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "mime": parsed.map(lambda t: t[0]),
                    "width": parsed.map(lambda t: t[1]).astype("Int32"),
                    "height": parsed.map(lambda t: t[2]).astype("Int32"),
                }
            )

    return media.mapInPandas(_kernel, schema=DIMS_SCHEMA)


def media_from_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test fixture builder: wrap a text column as a binary media table
    (the container ships no real media, so bytes come from utf-8 text)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/fake").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def sample_frames(
    media: DataFrame,
    n_frames: int = 8,
    id_col: str = "media_id",
    duration_col: str = "meta.duration_ms",
) -> DataFrame:
    """Video frame sampling plumbing: N evenly-spaced frame timestamps
    per clip — frame k of n over duration d lands at ``k*d/n`` ms
    (floor). Emits (media_id, frame_idx, frame_ts_ms); the actual frame
    EXTRACTION at those timestamps is the ffmpeg kernel a real pipeline
    plugs into ``extract_features``. Pure codegen explode — the frame
    list never exists driver-side, and a 10-hour video costs the same
    plan as a 10-second one."""
    d = F.col(duration_col).cast("bigint")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return media.select(
        F.col(id_col),
        F.explode(idx).alias("frame_idx"),
        d.alias("_d"),
    ).select(
        id_col,
        "frame_idx",
        F.floor(F.col("frame_idx") * F.col("_d") / n_frames).cast("bigint").alias("frame_ts_ms"),
    )


def chunk_audio(
    media: DataFrame,
    chunk_ms: int = 30_000,
    id_col: str = "media_id",
    duration_col: str = "meta.duration_ms",
) -> DataFrame:
    """Audio chunking plumbing: fixed windows over the clip duration —
    (media_id, chunk_idx, start_ms, end_ms), last chunk truncated to the
    duration. The decode-and-slice kernel is the pluggable part, the
    chunk table is exact and engine-replayable."""
    d = F.col(duration_col).cast("bigint")
    n_chunks = F.ceil(d / F.lit(chunk_ms)).cast("int")
    return media.filter(d.isNotNull() & (d > 0)).select(
        # rows with null/zero duration (non-audio media) emit NO chunks —
        # greatest/least silently skip NULLs and would otherwise invent a
        # [0, chunk_ms) chunk for a text document
        F.col(id_col),
        d.alias("_d"),
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias(
            "chunk_idx"
        ),
    ).select(
        id_col,
        "chunk_idx",
        (F.col("chunk_idx") * chunk_ms).cast("bigint").alias("start_ms"),
        F.least((F.col("chunk_idx") + 1) * chunk_ms, F.col("_d"))
        .cast("bigint")
        .alias("end_ms"),
    )


def repartition_by_bytes(
    media: DataFrame,
    target_mb: int = 256,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Size partitions by BYTE volume, not row count: media rows vary by
    orders of magnitude, and row-count partitioning puts ten 4K videos
    in one task and ten thumbnails in another. Range-partition on
    cumulative-size-friendly key (byte length) so each task sees a
    comparable decode budget. The partition count derives from the
    actual total volume — one agg, no collect of data."""
    sized = media.withColumn("_len", F.length(F.col(payload_col)).cast("bigint"))
    total = sized.agg(F.sum("_len")).first()[0] or 0
    n_parts = max(1, int(total / (target_mb * 1024 * 1024)) + 1)
    return sized.repartitionByRange(n_parts, F.col("_len"), F.col(id_col)).drop(
        "_len"
    )


def parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """REAL (codec-free) audio header parsing: (sample_rate, channels,
    bits_per_sample, duration_ms) from raw RIFF/WAVE bytes, or None if
    unrecognized or truncated — the audio counterpart to
    ``parse_image_dims``. No audio library needed: WAV is a chunked
    container whose ``fmt `` chunk holds the PCM parameters and whose
    ``data`` chunk size gives the frame count.

    - Container: ``RIFF`` at 0, ``WAVE`` at 8; then a chunk walk of
      (4-byte id, 4-byte little-endian size, payload) records padded to
      even ("word-aligned") offsets.
    - ``fmt ``: channels u16 @+2, sample_rate u32 @+4, block_align
      u16 @+12, bits_per_sample u16 @+14 (all little-endian).
    - ``data``: declared byte size → frames = size // block_align →
      duration_ms = frames * 1000 // sample_rate.

    The walk tolerates extra chunks (LIST/INFO/fact) in any order and a
    payload truncated after the data-chunk header (common when only the
    header region is fetched from object storage — the declared size is
    still authoritative for duration)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    fmt: tuple[int, int, int, int] | None = None
    data_size: int | None = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b) and size >= 16:
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
            block_align = int.from_bytes(b[i + 20 : i + 22], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
            fmt = (channels, sample_rate, block_align, bits)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if fmt is None or data_size is None:
        return None
    channels, sample_rate, block_align, bits = fmt
    if sample_rate <= 0 or block_align <= 0:
        return None
    n_frames = data_size // block_align
    return (sample_rate, channels, bits, n_frames * 1000 // sample_rate)


def parse_mp4_duration(b: bytes) -> tuple[int, int] | None:
    """REAL (codec-free) video header parsing: (timescale, duration_ms)
    from ISO-BMFF/MP4 bytes, or None — the video counterpart of
    ``parse_image_dims``/``parse_wav_header``. MP4 is a box tree:
    (4-byte big-endian size, 4-byte type) headers, where ``moov``
    contains ``mvhd`` whose movie-level timescale (units/second) and
    duration (units) sit at fixed offsets after the version byte.

    - top-level walk requires a leading ``ftyp`` box (the MP4 brand
      marker) and finds ``moov``; a 32-bit size of 1 means a 64-bit
      largesize follows (large-file form), size 0 means to-end-of-file.
    - inside ``moov``, child walk finds ``mvhd``: version 0 → u32
      creation/modification, then u32 timescale @12 / u32 duration
      @16 (offsets from the box payload start); version 1 → u64
      times, u32 timescale @20, u64 duration @24.
    - duration_ms = duration * 1000 // timescale.

    The walk tolerates other boxes in any order (free/mdat/udta) and a
    payload truncated after the mvhd fields (the object-storage
    header-fetch shape — mdat is never needed)."""

    def _walk(lo: int, hi: int, want: bytes) -> tuple[int, int] | None:
        """(payload_start, box_end) of the first ``want`` box in
        [lo, hi) — box_end bounds the CHILD walk, so a child scan never
        runs past its parent into sibling top-level boxes (an
        adversarial 'mvhd'-typed box after moov must not parse as a
        moov child)."""
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(b[i : i + 4], "big")
            btype = b[i + 4 : i + 8]
            payload = i + 8
            if size == 1:  # 64-bit largesize follows the type
                if i + 16 > hi:
                    return None
                size = int.from_bytes(b[i + 8 : i + 16], "big")
                payload = i + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - i
            if size < payload - i:
                return None  # corrupt: size smaller than its own header
            if btype == want:
                return payload, min(i + size, hi)
            i += size
        return None

    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    moov = _walk(0, len(b), b"moov")
    if moov is None:
        return None
    moov_payload, moov_end = moov
    hit = _walk(moov_payload, moov_end, b"mvhd")
    mvhd = None if hit is None else hit[0]
    if mvhd is None:
        return None
    if mvhd + 4 > len(b):
        return None
    version = b[mvhd]
    if version == 0:
        if mvhd + 20 > len(b):
            return None
        timescale = int.from_bytes(b[mvhd + 12 : mvhd + 16], "big")
        duration = int.from_bytes(b[mvhd + 16 : mvhd + 20], "big")
    elif version == 1:
        if mvhd + 32 > len(b):
            return None
        timescale = int.from_bytes(b[mvhd + 20 : mvhd + 24], "big")
        duration = int.from_bytes(b[mvhd + 24 : mvhd + 32], "big")
    else:
        return None
    if timescale <= 0:
        return None
    return (timescale, duration * 1000 // timescale)


VIDEO_SCHEMA = "media_id bigint, timescale int, duration_ms bigint"


def video_stats(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, timescale, duration_ms) via Arrow-batched MP4 box
    walking — rows whose payload isn't recognizable ISO-BMFF get nulls
    (same quarantine contract as ``image_dimensions``/``audio_stats``).
    O(header bytes) per row; mdat (the actual media data) is never
    touched, so a feature-film and a clip cost the same."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf[payload_col].map(
                lambda x: (
                    (parse_mp4_duration(bytes(x)) or (None, None))
                    if x is not None
                    else (None, None)
                )
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "timescale": parsed.map(lambda t: t[0]).astype("Int32"),
                    "duration_ms": parsed.map(lambda t: t[1]).astype("Int64"),
                }
            )

    return media.mapInPandas(_kernel, schema=VIDEO_SCHEMA)


AUDIO_SCHEMA = (
    "media_id bigint, sample_rate int, channels int, bits int, duration_ms bigint"
)


def audio_stats(
    media: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """(media_id, sample_rate, channels, bits, duration_ms) via
    Arrow-batched WAV header parsing — rows whose payload isn't a
    recognizable RIFF/WAVE get nulls (quarantine-friendly: filter
    ``sample_rate IS NULL`` to a reject sink), mirroring the
    ``image_dimensions`` contract. Cost is O(header bytes) per row
    regardless of clip size — a 3-hour recording and a 1-second clip
    parse identically, so partitions stay row-count-sized here (the
    byte-volume repartition matters only for the decode kernels)."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = pdf[payload_col].map(
                lambda x: (
                    (parse_wav_header(bytes(x)) or (None, None, None, None))
                    if x is not None
                    else (None, None, None, None)
                )
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "sample_rate": parsed.map(lambda t: t[0]).astype("Int32"),
                    "channels": parsed.map(lambda t: t[1]).astype("Int32"),
                    "bits": parsed.map(lambda t: t[2]).astype("Int32"),
                    "duration_ms": parsed.map(lambda t: t[3]).astype("Int64"),
                }
            )

    return media.mapInPandas(_kernel, schema=AUDIO_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, mime string, out_width int, out_height int, payload binary"
)


def resize_image(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Stub resize kernel: real pipelines plug PIL/torchvision here.
    ``fake=True`` produces a deterministic stand-in (sha256 of input ||
    target dims, repeated to a size proportional to the target area) so
    the Spark-side plumbing — batching, schema, byte passthrough — is
    fully testable without codecs."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic test kernel"
        )
    seed = hashlib.sha256(payload + f"|{width}x{height}".encode()).digest()
    n = max(1, (width * height) // 64)
    return (seed * (n // len(seed) + 1))[:n]


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Batch image resize over binary columns via Arrow ``mapInPandas``
    — the standard thumbnail/normalization pass of a multimodal
    pipeline. Only rows whose payload parses as a real image (PNG/JPEG/
    GIF header) are resized; others (and null payloads) quarantine with
    EVERY output column null (mime, out_width, out_height, payload) so
    any single column identifies the quarantine set. Pair with
    ``repartition_by_bytes`` upstream so a partition's decode budget is
    byte-bounded."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mimes, outs, ws, hs = [], [], [], []
            for b in pdf["payload"]:
                parsed = parse_image_dims(bytes(b)) if b is not None else None
                if parsed is None:
                    mimes.append(None)
                    outs.append(None)
                    ws.append(None)
                    hs.append(None)
                else:
                    mimes.append(parsed[0])
                    outs.append(resize_image(bytes(b), width, height, fake=fake))
                    ws.append(width)
                    hs.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": mimes,
                    # nullable Int32 (like image_dimensions), not int64 —
                    # quarantined rows carry nulls, not fake sizes
                    "out_width": pd.array(ws, dtype="Int32"),
                    "out_height": pd.array(hs, dtype="Int32"),
                    "payload": outs,
                }
            )

    return media.mapInPandas(_kernel, schema=RESIZED_SCHEMA)
