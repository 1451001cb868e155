"""PNG codec-free decode tests (VERDICT r3 next #8): the decoder's
unfilter/de-interlace is checked against an INDEPENDENT pure-Python forward
filter — the test encodes known pixels through each PNG filter type (and
through Adam7 pass extraction) and asserts _decode_png recovers them
exactly. No shared code with the implementation beyond stdlib zlib."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from dq_true_north_spark.textquality.multimodal import (
    _decode_png,
    _encode_png,
    _transform_one,
)

_CH = {0: 1, 2: 3, 4: 2, 6: 4}
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _mk_png(w, h, depth, ctype, interlace, raw) -> bytes:
    def chunk(t, d):
        return (len(d).to_bytes(4, "big") + t + d
                + (zlib.crc32(t + d) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, ctype, 0, 0, interlace]))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _forward_filter(px: list[list[int]], ch: int, filter_of_row) -> bytes:
    """Reference FORWARD filter (PNG spec §9, written from the spec, not
    from the decoder): produces the filtered scanline stream the decoder
    must invert. px is a list of rows of raw byte values."""
    out = bytearray()
    for y, row in enumerate(px):
        f = filter_of_row(y)
        out.append(f)
        for x, cur in enumerate(row):
            left = row[x - ch] if x >= ch else 0
            up = px[y - 1][x] if y else 0
            ul = px[y - 1][x - ch] if (y and x >= ch) else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - left
            elif f == 2:
                v = cur - up
            elif f == 3:
                v = cur - ((left + up) >> 1)
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                v = cur - pred
            out.append(v & 0xFF)
    return bytes(out)


def _rand_px(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w * ch), dtype=np.int64).tolist()


def _to_rgb(px, h, w, ctype):
    a = np.array(px, dtype=np.uint8).reshape(h, w, _CH[ctype])
    if ctype == 0:
        return np.repeat(a, 3, axis=2)
    if ctype == 4:
        return np.repeat(a[:, :, :1], 3, axis=2)
    return a[:, :, :3]


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_each_filter_type_inverts_exactly(f):
    px = _rand_px(5, 7, 3, seed=41 + f)
    blob = _mk_png(7, 5, 8, 2, 0, _forward_filter(px, 3, lambda y: f))
    assert np.array_equal(_decode_png(blob), _to_rgb(px, 5, 7, 2))


def test_mixed_filters_per_row():
    px = _rand_px(11, 6, 3, seed=7)
    blob = _mk_png(6, 11, 8, 2, 0, _forward_filter(px, 3, lambda y: y % 5))
    assert np.array_equal(_decode_png(blob), _to_rgb(px, 11, 6, 2))


@pytest.mark.parametrize("ctype", [0, 4, 6])
def test_color_types_normalize_to_rgb(ctype):
    ch = _CH[ctype]
    px = _rand_px(4, 5, ch, seed=100 + ctype)
    blob = _mk_png(5, 4, 8, ctype, 0, _forward_filter(px, ch, lambda y: y % 5))
    assert np.array_equal(_decode_png(blob), _to_rgb(px, 4, 5, ctype))


def test_adam7_deinterlace_matches_sequential():
    """The same image encoded interlaced (reference pass extraction per
    PNG spec §8.2, each pass independently filtered) decodes to the same
    pixels as the sequential encoding. 13x9 exercises every pass including
    partial ones."""
    h, w, ch = 9, 13, 3
    px = _rand_px(h, w, ch, seed=99)
    arr = np.array(px, dtype=np.int64).reshape(h, w, ch)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        rows = sub.reshape(ph, pw * ch).tolist()
        raw += _forward_filter(rows, ch, lambda y: (y + 1) % 5)
    inter = _mk_png(w, h, 8, ch == 3 and 2 or 0, 1, bytes(raw))
    seq = _mk_png(w, h, 8, 2, 0, _forward_filter(px, ch, lambda y: 0))
    assert np.array_equal(_decode_png(inter), _decode_png(seq))


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(6, 10, 3), dtype=np.int64).astype(np.uint8)
    assert np.array_equal(_decode_png(_encode_png(rgb)), rgb)


def test_palette_png_decodes_via_plte():
    """8-bit palette PNG (color type 3): scanlines carry indices, PLTE
    carries the colors — a lookup, not a codec. Built with an explicit
    PLTE chunk inserted before IDAT."""
    pal = np.array([[250, 10, 20], [30, 240, 50], [60, 70, 230], [5, 5, 5]],
                   dtype=np.uint8)
    idx = [[0, 1, 2], [3, 2, 1]]
    raw = _forward_filter([r[:] for r in idx], 1, lambda y: y % 5)
    blob = _mk_png(3, 2, 8, 3, 0, raw)
    plte = ((12).to_bytes(4, "big") + b"PLTE" + pal.tobytes()
            + (zlib.crc32(b"PLTE" + pal.tobytes()) & 0xFFFFFFFF)
            .to_bytes(4, "big"))
    i = blob.find(b"IDAT") - 4
    blob = blob[:i] + plte + blob[i:]
    assert np.array_equal(_decode_png(blob), pal[np.array(idx)])
    # index beyond the palette is malformed, not a variant
    bad = _mk_png(3, 2, 8, 3, 0,
                  _forward_filter([[9, 9, 9], [9, 9, 9]], 1, lambda y: 0))
    bad = bad[:bad.find(b"IDAT") - 4] + plte + bad[bad.find(b"IDAT") - 4:]
    assert _transform_one("u", bad, "resize", {"width": 1, "height": 1})[4] \
        == "error"


def test_sixteen_bit_png_msb_reduction():
    """16-bit samples reduce to their most-significant byte (the standard
    presentation conversion, spec §13.12). Fixture built with explicit
    16-bit big-endian sample bytes."""
    # 2x2 RGB, 16-bit: each sample = (msb, lsb); lsb must be dropped
    rows = [
        [0x12, 0xFF, 0x34, 0x00, 0x56, 0xAB,   0x78, 0x01, 0x9A, 0x02, 0xBC, 0x03],
        [0x00, 0x99, 0xFF, 0x99, 0x80, 0x99,   0x11, 0x00, 0x22, 0x00, 0x33, 0x00],
    ]
    blob = _mk_png(2, 2, 16, 2, 0, _forward_filter(rows, 6, lambda y: y % 5))
    got = _decode_png(blob)
    exp = np.array([[[0x12, 0x34, 0x56], [0x78, 0x9A, 0xBC]],
                    [[0x00, 0xFF, 0x80], [0x11, 0x22, 0x33]]], dtype=np.uint8)
    assert np.array_equal(got, exp)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub8_grayscale_unpacks_and_scales(depth):
    """1/2/4-bit grayscale: MSB-first bit unpacking, then full-range
    scaling v*255/(2^d-1). Fixture packs the bits by hand."""
    w, h = 5, 3
    maxv = (1 << depth) - 1
    vals = [[(x + y) % (maxv + 1) for x in range(w)] for y in range(h)]
    rows = []
    for r in vals:
        bits = "".join(format(v, f"0{depth}b") for v in r)
        bits += "0" * (-len(bits) % 8)
        rows.append([int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)])
    blob = _mk_png(w, h, depth, 0, 0, _forward_filter(rows, 1, lambda y: 0))
    got = _decode_png(blob)
    exp = np.repeat(
        (np.array(vals, dtype=np.uint16) * 255 // maxv)
        .astype(np.uint8)[:, :, None], 3, axis=2,
    )
    assert np.array_equal(got, exp)


def test_malformed_png_classification():
    """Per-row isolation contract: PNG decode is now COMPLETE over the
    legal depth/color-type matrix, so the only non-ok outcomes are
    malformed streams — including the spec's ILLEGAL combos (4-bit RGB,
    16-bit palette) and a palette image without PLTE."""
    palette_no_plte = _mk_png(2, 2, 8, 3, 0, b"\x00\x00\x00")
    four_bit_rgb = _mk_png(2, 2, 4, 2, 0, b"\x00\x00\x00")     # illegal combo
    sixteen_palette = _mk_png(2, 2, 16, 3, 0, b"\x00" * 10)    # illegal combo
    for blob in (palette_no_plte, four_bit_rgb, sixteen_palette):
        assert _transform_one("u", blob, "resize",
                              {"width": 1, "height": 1})[4] == "error"

    px = _rand_px(2, 2, 3, seed=1)
    good = _mk_png(2, 2, 8, 2, 0, _forward_filter(px, 3, lambda y: 0))
    truncated = good[: len(good) - 20]
    assert _transform_one("u", truncated, "resize", {"width": 1, "height": 1})[4] \
        == "error"
    bad_filter = _mk_png(2, 2, 8, 2, 0, b"\x09" + b"\x00" * 13)
    assert _transform_one("u", bad_filter, "resize", {"width": 1, "height": 1})[4] \
        == "error"
    # headers-only stub (the pre-round-4 sample): no IDAT -> error, honest
    stub = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + (320).to_bytes(4, "big") + (200).to_bytes(4, "big") + bytes(9))
    assert _transform_one("u", stub, "resize", {"width": 1, "height": 1})[4] \
        == "error"


def test_resize_is_exact_nearest_neighbor():
    px = _rand_px(8, 8, 3, seed=5)
    blob = _mk_png(8, 8, 8, 2, 0, _forward_filter(px, 3, lambda y: 4))
    url, out, n, op, status, err = _transform_one(
        "u", blob, "resize", {"width": 4, "height": 2}
    )
    assert status == "ok" and n == len(out)
    src = _to_rgb(px, 8, 8, 2)
    yi = (np.arange(2) * 8) // 2
    xi = (np.arange(4) * 8) // 4
    assert np.array_equal(_decode_png(out), src[yi][:, xi])


# -------------------------------------------------- WAV resample (round 4) --


def test_wav_resample_linear_reference():
    """PCM16 WAV resample: identity rate round-trips samples exactly;
    2x downsample equals every-second-frame; upsample midpoints equal the
    linear average of their neighbors (checked against a numpy reference
    built here, not the implementation's own math)."""
    import numpy as np

    from dq_true_north_spark.textquality.multimodal import (
        _transform_one,
        _wav_samples,
        sample_media_rows,
    )

    wav = dict(sample_media_rows())["media://wav"]
    _, x0 = _wav_samples(wav)

    same = _transform_one("u", wav, "resample", {"rate": 8000})
    assert same[4] == "ok"
    _, x_same = _wav_samples(same[1])
    assert np.array_equal(x0, x_same)

    down = _transform_one("u", wav, "resample", {"rate": 4000})
    info_d, x_down = _wav_samples(down[1])
    assert info_d["sample_rate"] == 4000 and len(x_down) == 4000
    assert np.array_equal(x_down, x0[::2])

    up = _transform_one("u", wav, "resample", {"rate": 16000})
    info_u, x_up = _wav_samples(up[1])
    assert info_u["sample_rate"] == 16000 and len(x_up) == 16000
    assert np.array_equal(x_up[::2], x0)          # originals preserved
    mids = (x0[:-1] + x0[1:]) / 2.0               # linear midpoints
    got_mids = x_up[1:-1:2]
    assert np.max(np.abs(got_mids - mids)) <= 1.0 / 32768  # int16 rounding


def test_wav_resample_stereo_and_classification():
    import numpy as np

    from dq_true_north_spark.textquality.multimodal import (
        _encode_wav,
        _transform_one,
        _wav_samples,
        sample_media_rows,
    )

    # stereo: channels resample independently
    t = np.arange(1000)
    left = (np.sin(2 * np.pi * 50 * t / 1000) * 16000).astype(np.int16)
    right = (np.cos(2 * np.pi * 80 * t / 1000) * 12000).astype(np.int16)
    stereo = _encode_wav(np.stack([left, right], axis=1), 1000)
    out = _transform_one("u", stereo, "resample", {"rate": 500})
    assert out[4] == "ok"
    info, x = _wav_samples(out[1])
    assert info["n_channels"] == 2
    frames = x.reshape(-1, 2)
    assert np.array_equal(frames[:, 0], left[::2] / 32768.0)
    assert np.array_equal(frames[:, 1], right[::2] / 32768.0)

    # compressed-audio RIFF (format tag 2 = ADPCM): a variant, not a defect
    adpcm = bytearray(dict(sample_media_rows())["media://wav"])
    adpcm[20:22] = (2).to_bytes(2, "little")
    assert _transform_one("u", bytes(adpcm), "resample", {"rate": 8000})[4] \
        == "unsupported"
    # non-audio formats
    html = dict(sample_media_rows())["media://html"]
    assert _transform_one("u", html, "resample", {"rate": 8000})[4] \
        == "unsupported"
