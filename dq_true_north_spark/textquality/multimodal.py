"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Metadata that CAN be read without a codec is
parsed for real from the container headers (all public, stable formats):

  PNG  — IHDR width/height (bytes 16..24, big-endian, PNG spec §11.2.2)
  GIF  — logical-screen width/height (bytes 6..10, little-endian, GIF89a §18)
  JPEG — SOFn frame header scan (ITU T.81 §B.2.2) for height/width

Pixel/sample DECODING (resize, frame extraction, feature vectors) genuinely
requires codec libraries that do not exist in this container; those rows get
``decoder='unsupported'`` and NULL decode-dependent fields — never fabricated
values. Swap `_decode_frames` for a real PIL/ffmpeg call on a cluster with
codecs — the mapInPandas plumbing, schema and batch shape do not change.

Reference analog: none — the reference is tabular-only; this is part of the
LLM-training-data operator set (SURVEY.md §2 extension).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "url string, byte_len long, format string, width int, height int, "
    "n_frames int, sample_frame_offsets array<int>, decoder string"
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<!DO": "html",
}

# JPEG start-of-frame markers that carry dimensions (T.81 §B.2.2);
# C4/C8/CC are huffman/arithmetic/extension markers, not frames.
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def _sniff_format(blob: bytes) -> str:
    for magic, fmt in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return fmt
    return "unknown"


def _png_dims(blob: bytes) -> tuple[int, int] | None:
    # 8-byte signature + IHDR chunk: length(4) type(4) width(4) height(4)
    if len(blob) >= 24 and blob[12:16] == b"IHDR":
        return (
            int.from_bytes(blob[16:20], "big"),
            int.from_bytes(blob[20:24], "big"),
        )
    return None


def _gif_dims(blob: bytes) -> tuple[int, int] | None:
    if len(blob) >= 10:
        return (
            int.from_bytes(blob[6:8], "little"),
            int.from_bytes(blob[8:10], "little"),
        )
    return None


def _jpeg_dims(blob: bytes) -> tuple[int, int] | None:
    # walk marker segments until a start-of-frame header
    i = 2
    n = len(blob)
    while i + 9 < n:
        if blob[i] != 0xFF:
            return None
        marker = blob[i + 1]
        if marker == 0xFF:      # fill byte
            i += 1
            continue
        if 0xD0 <= marker <= 0xD9:   # RSTn/SOI/EOI: no length field
            i += 2
            continue
        seg_len = int.from_bytes(blob[i + 2 : i + 4], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF:
            height = int.from_bytes(blob[i + 5 : i + 7], "big")
            width = int.from_bytes(blob[i + 7 : i + 9], "big")
            return (width, height)
        i += 2 + seg_len
    return None


_HEADER_PARSERS = {"png": _png_dims, "gif": _gif_dims, "jpeg": _jpeg_dims}


def _gif_frame_offsets(blob: bytes) -> list[int] | None:
    """Byte offsets of every image-descriptor block (0x2C) — a GIF frame
    count WITHOUT a codec, by walking the block structure (GIF89a §§18-20:
    header + logical screen descriptor, optional global color table, then
    extensions (0x21, length-prefixed sub-blocks) and image descriptors
    (9-byte header + optional local color table + LZW sub-blocks) until the
    0x3B trailer). A raw byte scan for 0x2C would overcount — the byte is
    legal inside color tables and compressed data; the walk is exact.
    Returns None (honest unknown, decoder='unsupported') on a malformed or
    truncated stream, never a guess."""
    n = len(blob)
    if n < 13:
        return None
    i = 13
    packed = blob[10]
    if packed & 0x80:                   # global color table (§18)
        i += 3 * (2 << (packed & 0x07))
    offsets: list[int] = []

    def _skip_subblocks(j: int) -> int:
        while j < n and blob[j] != 0:
            j += 1 + blob[j]
        return j + 1                    # past the 0x00 terminator

    while i < n:
        b = blob[i]
        if b == 0x3B:                   # trailer: clean end of stream
            return offsets or None
        if b == 0x21:                   # extension: label + sub-blocks
            i = _skip_subblocks(i + 2)
        elif b == 0x2C:                 # image descriptor (§20)
            offsets.append(i)
            if i + 11 > n:
                return None
            lct = blob[i + 9]
            i += 10
            if lct & 0x80:              # local color table
                i += 3 * (2 << (lct & 0x07))
            i = _skip_subblocks(i + 1)  # LZW min code size + data
        else:
            return None                 # malformed block label
    return None                         # ran off the end without a trailer


def _decode_frames(fmt: str, blob: bytes):
    """Frame metadata — still-image formats are single-frame by definition;
    GIF frame counts come from the codec-free block walk above. Pixel/sample
    DECODE remains codec-dependent (riff/unknown return None); a real
    deployment swaps in PIL/ffmpeg, the contract is
    (n_frames, sample_frame_offsets) or None."""
    if fmt in ("png", "jpeg"):
        return 1, [0]
    if fmt == "gif":
        offs = _gif_frame_offsets(blob)
        if offs is not None:
            return len(offs), offs
    return None  # riff/html/unknown (or malformed gif) need a codec


def _meta_one(url: str, blob: bytes) -> tuple:
    fmt = _sniff_format(blob)
    dims = _HEADER_PARSERS.get(fmt, lambda b: None)(blob)
    frames = _decode_frames(fmt, blob)
    decoder = "headers" if (dims or frames) else "unsupported"
    return (
        url,
        len(blob),
        fmt,
        dims[0] if dims else None,
        dims[1] if dims else None,
        frames[0] if frames else None,
        frames[1] if frames else [],
        decoder,
    )


def decode_media_meta(pages: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas over (url, binary) — Arrow batches in, metadata out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                _meta_one(u, bytes(blob))
                for u, blob in zip(b["url"], b[binary_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "byte_len", "format", "width", "height",
                    "n_frames", "sample_frame_offsets", "decoder",
                ],
            )

    return pages.select("url", binary_col).mapInPandas(
        run, schema=MEDIA_META_SCHEMA
    )


MEDIA_TRANSFORM_SCHEMA = (
    "url string, out_bytes binary, out_byte_len long, op string, "
    "status string, error string"
)

_SUPPORTED_OPS = ("resize", "frame_sample", "passthrough")


def _transform_one(url: str, blob: bytes, op: str, params: dict) -> tuple:
    """Per-item media transform. The Spark-side contract (binary in →
    binary out, per-row error isolation into `status`/`error`) is real;
    the pixel work needs codecs this container lacks, so everything except
    `passthrough` raises NotImplementedError — which the plumbing catches
    per row instead of failing the task. Swap this function for a
    PIL/ffmpeg implementation on a cluster with codecs; nothing else
    changes."""
    try:
        if op == "passthrough":
            out = blob
        elif op == "resize":
            raise NotImplementedError(
                f"resize to {params.get('width')}x{params.get('height')} "
                f"requires an image codec (none in this container)"
            )
        elif op == "frame_sample":
            raise NotImplementedError(
                f"sampling {params.get('n_frames', 4)} frames requires a "
                f"video codec (none in this container)"
            )
        else:
            raise ValueError(f"unknown media op {op!r}")
        return (url, out, len(out), op, "ok", None)
    except NotImplementedError as exc:
        return (url, None, None, op, "unsupported", str(exc))
    except Exception as exc:  # a real decoder's per-item failures land here
        return (url, None, None, op, "error", f"{type(exc).__name__}: {exc}")


def transform_media(pages: DataFrame, binary_col: str = "html",
                    op: str = "resize", **params) -> DataFrame:
    """mapInPandas media transform — Arrow batches of (url, binary) in,
    (url, binary, status) out. Batch shape and schema are the production
    contract; per-row failures become status='unsupported'/'error' rows,
    never task failures (a 10^12-item run cannot die on one corrupt GIF)."""
    import pandas as pd
    from collections.abc import Iterator

    if op not in _SUPPORTED_OPS:
        raise ValueError(f"op must be one of {_SUPPORTED_OPS}, got {op!r}")

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for b in batches:
            rows = [
                _transform_one(u, bytes(blob), op, params)
                for u, blob in zip(b["url"], b[binary_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["url", "out_bytes", "out_byte_len", "op",
                         "status", "error"],
            )

    return pages.select("url", binary_col).mapInPandas(
        run, schema=MEDIA_TRANSFORM_SCHEMA
    )
