"""GIF LZW codec tests (round 4): the decoder is checked against an
INDEPENDENT reference decoder written here from the GIF89a appendix-F text
(bit-by-bit reader, list-based string table — no shared code with the
implementation), plus a hand-verified code-sequence fixture and round-trips
through dictionary growth, the KwKwK case and 12-bit dictionary resets."""

from __future__ import annotations

import numpy as np
import pytest

from dq_true_north_spark.textquality.multimodal import (
    _decode_gif_frame0,
    _encode_gif,
    _gif_frame_offsets,
    _gif_lzw_decode,
    _gif_lzw_encode,
)


def _reference_lzw_decode(data: bytes, mcs: int) -> list[int]:
    """Straightforward appendix-F decoder: reads one bit at a time."""
    bits = [(byte >> i) & 1 for byte in data for i in range(8)]
    pos = 0
    clear, end = 1 << mcs, (1 << mcs) + 1

    def read(width):
        nonlocal pos
        if pos + width > len(bits):
            raise ValueError("truncated")
        v = sum(b << i for i, b in enumerate(bits[pos : pos + width]))
        pos += width
        return v

    width = mcs + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        else:
            entry = prev + [prev[0]]
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def test_hand_verified_code_sequence():
    """[0,0,1,1,0] at mcs=2 must encode to exactly the hand-derived code
    sequence 4@3,0@3,0@3,1@3,1@4,0@4,5@4 (deferred width bump) — packed
    LSB-first. Catches any silent change to the width-alignment contract."""
    got = _gif_lzw_encode([0, 0, 1, 1, 0], 2)
    # hand-packed: codes/widths (4,3)(0,3)(0,3)(1,3)(1,4)(0,4)(5,4)
    acc = bits = 0
    out = bytearray()
    for code, width in [(4, 3), (0, 3), (0, 3), (1, 3), (1, 4), (0, 4), (5, 4)]:
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    assert got == bytes(out)
    assert _gif_lzw_decode(got, 2) == [0, 0, 1, 1, 0]


@pytest.mark.parametrize("n,k,seed", [
    (10, 4, 1), (500, 4, 2), (50_000, 4, 3),      # fills the 12-bit dict
    (20_000, 16, 4), (300, 256, 5), (30_000, 256, 6),
])
def test_roundtrip_and_reference_agreement(n, k, seed):
    rng = np.random.RandomState(seed)
    seq = rng.randint(0, k, n).tolist()
    mcs = max(2, (k - 1).bit_length())
    enc = _gif_lzw_encode(seq, mcs)
    assert _gif_lzw_decode(enc, mcs) == seq
    assert _reference_lzw_decode(enc, mcs) == seq


def test_kwkwk_runs():
    for seq in ([0] * 64, [0, 1] * 50, [3, 3, 3, 1] * 40):
        enc = _gif_lzw_encode(seq, 2)
        assert _gif_lzw_decode(enc, 2) == seq
        assert _reference_lzw_decode(enc, 2) == seq


def test_gif_frame_decode_and_reencode():
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 7, size=(9, 13)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(7, 3)).astype(np.uint8)
    blob = _encode_gif(idx, pal)
    assert _gif_frame_offsets(blob) is not None
    i2, p2 = _decode_gif_frame0(blob)
    assert np.array_equal(i2, idx)
    assert np.array_equal(p2[:7], pal)


def test_interlaced_gif_decodes_in_display_order():
    """An interlaced frame (descriptor flag 0x40) stores rows in the four
    GIF passes; the decoder must restore display order. The fixture is
    built by permuting the rows into pass order ourselves."""
    h, w = 11, 5
    rng = np.random.RandomState(12)
    idx = rng.randint(0, 4, size=(h, w)).astype(np.uint8)
    pass_rows = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    stored = idx[pass_rows]                       # rows as stored on disk
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170],
                    [255, 255, 255]], dtype=np.uint8)
    hdr = (b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
           + bytes([0x80 | 1, 0, 0]) + pal.tobytes())
    desc = (b"\x2c" + bytes(4) + w.to_bytes(2, "little")
            + h.to_bytes(2, "little") + bytes([0x40]))   # interlaced
    lzw = _gif_lzw_encode(stored.reshape(-1), 2)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        sub.append(len(part))
        sub += part
    sub.append(0)
    blob = hdr + desc + bytes([2]) + bytes(sub) + b"\x3b"
    got, _ = _decode_gif_frame0(blob)
    assert np.array_equal(got, idx)


def test_malformed_gif_streams_raise():
    idx = np.zeros((2, 2), dtype=np.uint8)
    pal = np.zeros((2, 3), dtype=np.uint8)
    good = _encode_gif(idx, pal)
    with pytest.raises(ValueError):
        _decode_gif_frame0(good[:20])             # truncated
    # pixel data short: claim 4x4 but encode 2x2 worth of indices
    tampered = bytearray(good)
    tampered[6:8] = (4).to_bytes(2, "little")     # logical screen w
    # descriptor w at offset: header 13 + GCT 12 -> descriptor at 25; w at +5
    tampered[25 + 5 : 25 + 7] = (4).to_bytes(2, "little")
    tampered[25 + 7 : 25 + 9] = (4).to_bytes(2, "little")
    with pytest.raises(ValueError, match="short"):
        _decode_gif_frame0(bytes(tampered))
