"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media decoding is STUBBED because
no image/audio libraries exist in this container. `decode_media_meta`
extracts what CAN be read without a codec (byte length, magic-derived
format) and fills decoder-dependent fields (width/height/frames) with a
deterministic fake derived from the content hash, clearly marked by
`decoder="stub"`. Swap `_decode_one` for a real PIL/ffmpeg call on a
cluster with codecs — nothing else changes.
"""

from __future__ import annotations

import hashlib
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


def _sniff_format(blob: bytes) -> str:
    for magic, fmt in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return fmt
    return "unknown"


def _decode_one(url: str, blob: bytes) -> tuple:
    """STUB decode: deterministic fake dimensions from the content hash.

    Raises nothing; a real decoder would NotImplementedError on codecs it
    lacks — the pipeline isolates that per-row into decoder='error'.
    """
    h = int.from_bytes(hashlib.sha256(blob).digest()[:8], "big")
    width = 160 + (h % 1920)
    height = 120 + ((h >> 16) % 1080)
    n_frames = 1 + ((h >> 32) % 240)
    step = max(1, n_frames // 4)
    offsets = list(range(0, n_frames, step))[:4]
    return (
        url, len(blob), _sniff_format(blob),
        int(width), int(height), int(n_frames), offsets, "stub",
    )


def decode_media_meta(pages: DataFrame, binary_col: str = "html") -> DataFrame:
    """mapInPandas over (url, binary) — Arrow batches in, metadata out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [
                _decode_one(u, bytes(blob))
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
