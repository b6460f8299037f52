"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, decoded/featurized through Arrow-batched pandas UDFs.

The reference is text-only; these operators extend the engine with the
multimodal pathway a training-data pipeline needs. Decode depth is split in
two (round 6): HEADER decode — container magic + pixel dimensions for
PNG (IHDR) / JPEG (SOFn walk) / GIF (logical screen) — is a REAL pure-stdlib
kernel (``parse_image_dims``, no codec library needed; the byte layouts are
public file-format specs), run inside the existing mapInPandas iterators.
Full PIXEL decode still requires a codec library (PIL / soundfile), absent
in this container, so ``decode_image``/``decode_audio`` raise
NotImplementedError unless one is importable — that path is reserved for
real codecs only. ``fake_decode_meta`` remains as the deterministic
stand-in for pixel-level plumbing tests.

Scale notes:
  * Binary payloads ride as parquet binary; metadata-only queries must never
    deserialize them (column pruning — see tests).
  * Decode is mapInPandas (iterator form) so one task streams many Arrow
    batches without buffering the whole partition.
  * maxRecordsPerBatch should be lowered for large blobs (a 4MB image x
    10k-row default batch would OOM the worker; 64-256 rows is right).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not in sandbox
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_META_SCHEMA = (
    "media_id string, n_bytes bigint, content_md5 string, "
    "magic string, media_kind string"
)

_MAGIC = {
    b"\xff\xd8\xff": ("jpeg", "image"),
    b"\x89PNG": ("png", "image"),
    b"GIF8": ("gif", "image"),
    b"OggS": ("ogg", "audio"),
    b"\x1aE\xdf\xa3": ("mkv", "video"),
}

# RIFF is a CONTAINER: the form type at bytes 8:12 says what it holds
# (review finding: a flat RIFF->audio mapping sent WebP images and AVI
# videos down the audio path). Unknown forms stay ('riff', 'unknown') —
# fail open on kind, not misclassified.
_RIFF_FORMS = {
    b"WAVE": ("wav", "audio"),
    b"WEBP": ("webp", "image"),
    b"AVI ": ("avi", "video"),
}


def sniff_media(blob: bytes | None) -> tuple[str, str]:
    if not blob:
        return ("empty", "unknown")
    if blob[:4] == b"RIFF":
        return _RIFF_FORMS.get(blob[8:12], ("riff", "unknown"))
    for magic, kind in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return kind
    return ("unknown", "unknown")


def media_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """Typed metadata over an opaque binary column via mapInPandas.
    Iterator form: constant memory per task regardless of partition size."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                magic, kind = sniff_media(b)
                rows.append(
                    {
                        "media_id": str(mid),
                        "n_bytes": len(b),
                        "content_md5": hashlib.md5(b).hexdigest(),
                        "magic": magic,
                        "media_kind": kind,
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "content_md5", "magic", "media_kind"
            ])

    return df.select(id_col, blob_col).mapInPandas(batches, MEDIA_META_SCHEMA)


def parse_image_dims(blob: bytes | None) -> tuple[str, int, int] | None:
    """Pure-stdlib image HEADER decode: (magic, width, height) for PNG /
    JPEG / GIF byte streams, None for anything else (including truncated
    headers). Byte layouts are the public format specs:

      * PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
        big-endian u32 width at offset 16, height at 20.
      * GIF: 'GIF87a'/'GIF89a', then LITTLE-endian u16 logical-screen
        width/height at offsets 6/8.
      * JPEG: marker-segment walk from SOI (FFD8): each segment is FF,
        marker, big-endian u16 length (incl. itself); the frame headers
        SOF0-SOF15 (C0-CF minus the non-frame C4/C8/CC) carry u8
        precision then u16 height, u16 width. Standalone markers
        (D0-D9, 01) have no length field. Walk stops at SOS (DA) —
        dimensions always precede entropy-coded data.

    This is the decode step a 100 TB multimodal triage pass actually needs
    (filter/bucket by dimensions WITHOUT a codec or pixel buffers); pixel
    decode stays behind decode_image's NotImplementedError until a codec
    library exists."""
    import struct

    if not blob:
        return None
    b = bytes(blob)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        n = len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                return None  # corrupt marker stream
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
                i += 2
                continue
            if marker in (0xD8, 0xD9, 0xDA):
                # SOS / EOI: dims always precede them; a stray SOI
                # mid-stream is corruption — fail closed (None), never
                # reinterpret payload bytes as a length-bearing segment
                return None
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if seg_len < 2:  # length includes itself; < 2 is corrupt
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None


DIMS_SCHEMA = "media_id string, magic string, width int, height int"


def media_dims(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """(media_id, magic, width, height) via the real header kernel —
    mapInPandas iterator form (constant memory per task); unparseable or
    non-image blobs yield NULL magic/dims so a bad byte stream is a row,
    never a task failure (the engine's D4 error-isolation contract)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                parsed = parse_image_dims(
                    None if blob is None else bytes(blob)
                )
                magic, w, h = parsed if parsed else (None, None, None)
                rows.append(
                    {"media_id": str(mid), "magic": magic, "width": w, "height": h}
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "magic", "width", "height"]
            )

    return df.select(id_col, blob_col).mapInPandas(batches, DIMS_SCHEMA)


def decode_image(blob: bytes) -> "object":  # pragma: no cover - stub
    """Real decode kernel — requires PIL, absent in this container."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this container has no codecs. "
            "Use fake_decode_meta for plumbing tests."
        )
    import io

    return Image.open(io.BytesIO(blob))


def fake_decode_meta(blob: bytes | None) -> dict:
    """Deterministic decode stand-in: derives fake (width, height, channels)
    from the content hash — stable across engines/runs, exercises the same
    dataflow as a real decoder."""
    import hashlib

    if not blob:
        return {"width": 0, "height": 0, "channels": 0}
    h = int(hashlib.md5(bytes(blob)).hexdigest()[:8], 16)
    return {
        "width": 64 + h % 1920,
        "height": 64 + (h >> 8) % 1080,
        "channels": 1 + (h >> 16) % 4,
    }


DECODE_SCHEMA = "media_id string, width int, height int, channels int"


def decode_meta(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """The decode stage with the stub kernel (swap fake_decode_meta for a
    real decoder when codecs exist; the Spark plumbing is identical)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                m = fake_decode_meta(None if blob is None else bytes(blob))
                m["media_id"] = str(mid)
                rows.append(m)
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "channels"])

    return df.select(id_col, blob_col).mapInPandas(batches, DECODE_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, blob_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: 1 blob -> N frame rows (1:N mapInPandas
    fan-out); frame extraction itself is the stubbed kernel (frame bytes =
    deterministic slices so the fan-out shape is real)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                n_frames = max(1, len(b) // max(every_n, 1) // 64)
                n_frames = min(n_frames, 16)
                for i in range(n_frames):
                    out.append(
                        {
                            "media_id": str(mid),
                            "frame_idx": i,
                            "frame_bytes": b[i * 64 : (i + 1) * 64],
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.select(id_col, blob_col).mapInPandas(
        batches, "media_id string, frame_idx int, frame_bytes binary"
    )
