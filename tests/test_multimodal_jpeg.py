"""JPEG codec tests (baseline round 4, progressive round 5): the decoder
is checked against a
hand-crafted, encoder-independent single-block fixture (every byte written
out in the test from the T.81 rules), flat fields round-trip EXACTLY at
quality 100, smooth content is error-bounded, and restart/subsampling/
grayscale/malformed paths are pinned."""

from __future__ import annotations

import numpy as np
import pytest

from dq_true_north_spark.textquality.jpeg import decode_jpeg, encode_jpeg
from dq_true_north_spark.textquality.multimodal import _transform_one


def _hand_crafted_gray_block(dc: int) -> bytes:
    """A grayscale 8x8 single-block JPEG written byte-by-byte in the test:
    quant table all 16s, equal-length canonical Huffman tables (DC: 12
    symbols at 4 bits; AC: 162 symbols at 8 bits), one DC coefficient and
    an EOB. Expected pixel: a DC-only block IDCTs to the flat value
    128 + dc*quant/8 = 128 + 2*dc."""
    assert 2 <= dc <= 3                   # category 2 keeps the bits simple
    dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0]) + bytes([16] * 64)
    sof = (b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
           + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    dc_counts = [0, 0, 0, 12] + [0] * 12
    dc_syms = list(range(12))
    ac_syms = sorted([0x00, 0xF0]
                     + [(r << 4) | s for r in range(16) for s in range(1, 11)])
    ac_counts = [0] * 7 + [len(ac_syms)] + [0] * 8
    dht = (b"\xff\xc4" + (2 + 1 + 16 + 12).to_bytes(2, "big")
           + bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)
           + b"\xff\xc4" + (2 + 1 + 16 + len(ac_syms)).to_bytes(2, "big")
           + bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    sos = (b"\xff\xda" + (8).to_bytes(2, "big")
           + bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy bits: DC category 2 -> canonical 4-bit code 0010, then the
    # category-2 raw bits for `dc` (dc=3 -> '11', dc=2 -> '10'), then EOB =
    # the numerically-first AC symbol -> 8-bit code 00000000; pad with 1s.
    bits = "0010" + format(dc, "02b") + "00000000"
    bits += "1" * (-len(bits) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    return b"\xff\xd8" + dqt + sof + dht + sos + data + b"\xff\xd9"


def test_hand_crafted_dc_only_block():
    for dc in (2, 3):
        out = decode_jpeg(_hand_crafted_gray_block(dc))
        assert out.shape == (8, 8, 3)
        assert np.all(out == 128 + 2 * dc), out[0, 0]


@pytest.mark.parametrize("c", [0, 7, 128, 200, 255])
def test_flat_field_exact_at_quality_100(c):
    img = np.full((16, 24, 3), c, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


@pytest.mark.parametrize("subsample", [False, True])
def test_smooth_gradient_error_bounded(subsample):
    base = np.linspace(40, 210, 24)
    rng = np.random.RandomState(5)
    img = np.clip(
        np.add.outer(base, base)[:, :, None] / 2
        + rng.randint(0, 5, (24, 24, 3)),
        0, 255,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))
    assert out.shape == img.shape
    assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 8


def test_odd_dimensions_crop_back():
    img = np.clip(
        np.add.outer(np.arange(13) * 9, np.arange(21) * 5)[:, :, None]
        + np.zeros((1, 1, 3)), 0, 255,
    ).astype(np.uint8)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert out.shape == (13, 21, 3)
        assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 4


def test_restart_markers_roundtrip():
    rng = np.random.RandomState(9)
    img = np.clip(
        np.add.outer(np.arange(24) * 4, np.arange(40) * 3)[:, :, None]
        + rng.randint(0, 3, (24, 40, 3)), 0, 255,
    ).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=95))
    restarted_blob = encode_jpeg(img, quality=95, restart_interval=2)
    assert b"\xff\xdd" in restarted_blob            # DRI present
    assert b"\xff\xd0" in restarted_blob            # RST0 present
    assert np.array_equal(decode_jpeg(restarted_blob), plain)


def test_noise_roundtrips_deterministically():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    b1 = encode_jpeg(img, quality=50)
    b2 = encode_jpeg(img, quality=50)
    assert b1 == b2
    assert decode_jpeg(b1).shape == (64, 64, 3)


def test_byte_stuffing_both_directions():
    """A 0xFF entropy byte must be stuffed on write and destuffed on read
    — unit-pinned on the bit plumbing itself, then end-to-end: raw DC bits
    chosen so the packed stream contains 0xFF."""
    from dq_true_north_spark.textquality.jpeg import _BitWriter, _split_entropy

    wtr = _BitWriter()
    wtr.write(0xFF, 8)
    wtr.write(0xA5, 8)
    assert bytes(wtr.out) == b"\xff\x00\xa5"
    segs, end = _split_entropy(b"\xff\x00\xa5\xff\xd9", 0)
    assert segs == [b"\xff\xa5"] and end == 3

    # end-to-end: DC category 11 with raw bits 11111111111 packs a 0xFF
    # byte right after the 4-bit code 1011 -> stream starts 1011 1111 1111...
    img = np.full((8, 8, 3), 255, dtype=np.uint8)
    blob = encode_jpeg(img, quality=1)              # coarse quant, big DC
    assert decode_jpeg(blob).shape == (8, 8, 3)


def test_unsupported_vs_malformed_classification():
    img = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = encode_jpeg(img, quality=90)

    arithmetic = bytearray(good)
    i = arithmetic.find(b"\xff\xc0")
    arithmetic[i + 1] = 0xC9                        # SOF0 -> SOF9 (arith)
    assert _transform_one("u", bytes(arithmetic), "resize",
                          {"width": 2, "height": 2})[4] == "unsupported"

    # SOF2 is DECODED since round 5 — but a SOF2 frame whose scan carries
    # a baseline-style header (Ss=0, Se=63) is malformed per annex G
    # (progressive scans are DC-only or AC-band), so the old flipped-marker
    # probe now classifies 'error', not 'unsupported'
    flipped = bytearray(good)
    flipped[i + 1] = 0xC2
    assert _transform_one("u", bytes(flipped), "resize",
                          {"width": 2, "height": 2})[4] == "error"

    truncated = good[: len(good) // 2]
    assert _transform_one("u", truncated, "resize",
                          {"width": 2, "height": 2})[4] == "error"

    # header-only stub (the pre-round-4 sample shape): dims parse but there
    # is no scan -> error, honestly
    stub = (b"\xff\xd8\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF"
            + bytes(10) + b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
            + (120).to_bytes(2, "big") + (160).to_bytes(2, "big") + bytes(12))
    assert _transform_one("u", stub, "resize",
                          {"width": 2, "height": 2})[4] == "error"


def test_resize_through_transform_is_real():
    img = np.zeros((8, 16, 3), dtype=np.uint8)
    img[:, :8] = (200, 60, 60)
    img[:, 8:] = (60, 60, 200)
    blob = encode_jpeg(img, quality=90)
    url, out, n, op, status, err = _transform_one(
        "u", blob, "resize", {"width": 4, "height": 2}
    )
    assert status == "ok" and n == len(out)
    px = decode_jpeg(out)
    assert px.shape == (2, 4, 3)
    # two-tone flat halves survive resize + requantization nearly exactly
    assert np.max(np.abs(px[:, :2].astype(int) - [200, 60, 60])) <= 4
    assert np.max(np.abs(px[:, 2:].astype(int) - [60, 60, 200])) <= 4


# ------------------------------------------------- progressive (round 5) ----


def test_progressive_decode_equals_baseline_exactly():
    """The bit-reorder identity: progressive coding permutes the entropy
    bits but carries the SAME quantized coefficients, so the decoded
    pixels of encode_jpeg_progressive and encode_jpeg must match EXACTLY
    (any scan-logic slip desyncs the huffman stream and errors instead).
    Covers odd dimensions, 4:2:0 subsampling (padded luma MCU grid vs
    tight AC-scan grid), multiple qualities, and a flat field."""
    from dq_true_north_spark.textquality.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    cases = [
        (rng.integers(0, 256, (16, 16, 3)).astype(np.uint8), 90, False),
        (rng.integers(0, 256, (24, 17, 3)).astype(np.uint8), 75, False),
        ((np.arange(33 * 20 * 3).reshape(33, 20, 3) % 256).astype(np.uint8),
         90, True),
        (rng.integers(0, 256, (20, 33, 3)).astype(np.uint8), 50, True),
        (np.full((8, 8, 3), 130, np.uint8), 100, False),
        (rng.integers(0, 256, (9, 9, 3)).astype(np.uint8), 95, True),
    ]
    for img, q, sub in cases:
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        blob = encode_jpeg_progressive(img, quality=q, subsample=sub)
        assert blob.find(b"\xff\xc2") > 0               # really SOF2
        assert blob.count(b"\xff\xda") >= 10            # really multi-scan
        assert np.array_equal(decode_jpeg(blob), base), (q, sub, img.shape)


def test_progressive_ac_refinement_eob_runs_multiblock():
    """AC successive-approximation refinement across blocks — the part of
    annex G where every off-by-one lives (EOB runs covering whole blocks,
    buffered correction bits riding after the next EOBn/ZRL symbol, runs
    that count only zero-history positions). Scan-level roundtrips on
    planted block patterns: all-empty (pure EOB run), empty-sandwich,
    sparse-tiny (newly-significant only), dense-tiny, sparse-large
    (history-heavy)."""
    from dq_true_north_spark.textquality import jpeg as J

    rng = np.random.default_rng(1)
    tab = J._build_decode_table(J._PAC_COUNTS, J._PAC_SYMS)

    def mk(density, scale=30):
        v = np.zeros(64, np.int64)
        nz = rng.random(63) < density
        v[1:][nz] = rng.integers(-scale, scale + 1, nz.sum())
        return v

    patterns = [
        [mk(0.0) for _ in range(5)],
        [mk(0.3), mk(0.0), mk(0.0), mk(0.3)],
        [mk(0.02, 3) for _ in range(10)],
        [mk(0.6), mk(0.01, 2), mk(0.0), mk(0.9)],
        [mk(0.05, 100) for _ in range(8)],
        [mk(0.5, 2) for _ in range(6)],
    ]
    for vecs in patterns:
        stores = [np.zeros(64, np.int64) for _ in vecs]
        for al, enc, dec in ((2, J._enc_ac_first, J._prog_ac_first),
                             (1, J._enc_ac_refine, J._prog_ac_refine),
                             (0, J._enc_ac_refine, J._prog_ac_refine)):
            w = J._BitWriter()
            enc(w, vecs, 1, 63, al)
            w.flush()
            r = J._BitReader(bytes(w.out))
            eobrun = 0
            for s in stores:
                eobrun = dec(r, s, 1, 63, al, tab, eobrun)
        for s, v in zip(stores, vecs):
            assert np.array_equal(s[1:], v[1:])


def test_progressive_through_media_transform():
    """A progressive stream flows through the transform operator as 'ok'
    now (round 5) — resize decodes SOF2 for real and re-encodes."""
    from dq_true_north_spark.textquality.jpeg import encode_jpeg_progressive

    img = (np.arange(24 * 16 * 3).reshape(24, 16, 3) % 200).astype(np.uint8)
    blob = encode_jpeg_progressive(img, quality=85)
    row = _transform_one("u", blob, "resize", {"width": 4, "height": 6})
    assert row[4] == "ok"
    out = decode_jpeg(row[1])
    assert out.shape == (6, 4, 3)


def test_progressive_restart_markers_roundtrip():
    """Progressive scans with DRI/RSTn: every scan is segmented (DC
    predictors and EOB runs reset per segment, byte-aligned, RST0-7
    cycling) and the decoder's per-scan restart path reproduces the
    plain-progressive — and therefore the baseline — pixels exactly.
    ri=1 is the stress case (a restart after every single unit)."""
    from dq_true_north_spark.textquality.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    for h, w, q, sub, ri in ((24, 17, 85, False, 2), (33, 20, 90, True, 3),
                             (16, 16, 75, False, 1)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        blob = encode_jpeg_progressive(img, quality=q, subsample=sub,
                                       restart_interval=ri)
        assert b"\xff\xdd" in blob and b"\xff\xd0" in blob
        assert np.array_equal(decode_jpeg(blob), base), (h, w, q, sub, ri)
