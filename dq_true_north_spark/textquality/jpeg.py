"""JPEG (ITU T.81) decode + encode in pure numpy + stdlib — baseline
sequential (SOF0/1) AND progressive (SOF2, round 5).

JPEG's entropy coding is canonical Huffman over run-length-coded DCT
coefficients — like PNG/zlib and GIF/LZW before it, nothing here needs a
codec library, only careful bit work:

  decode_jpeg — baseline sequential SOF0: marker walk, DQT/DHT/SOF0/SOS/DRI
      parsing, byte-destuffed Huffman bitstream, DC prediction + AC
      run-length (EOB/ZRL), dequantize, de-zigzag, orthonormal IDCT (one
      numpy matmul pair per 8x8 block), sampling-factor block assembly,
      chroma upsampling, JFIF YCbCr->RGB. Grayscale and 3-component
      streams, arbitrary h/v sampling factors in {1, 2}, restart markers.
      Progressive SOF2 streams route to _decode_progressive (spectral
      selection + successive approximation + EOB runs, annex G);
      arithmetic / lossless / hierarchical / 12-bit / 4-component streams
      raise NotImplementedError (per-row 'unsupported', never fabricated
      pixels).

  encode_jpeg — the inverse: RGB->YCbCr, optional 4:2:0 chroma box
      subsampling, FDCT, quality-scaled annex-K example quantization
      tables, zigzag + DC-diff/AC run-length, and SELF-DESCRIBING
      equal-length canonical Huffman tables written into DHT. Equal-length
      codes are deliberately suboptimal (~2x larger files than annex-K
      tables) but trivially valid prefix codes that avoid the reserved
      all-ones codeword — and since JPEG files CARRY their tables, any
      conformant decoder reads them; nothing depends on reproducing the
      annex-K Huffman constants from memory.

Verification strategy (tests/test_multimodal_jpeg.py): decode is checked
against hand-computed DC-only blocks (flat fields decode EXACTLY at
quality 100 where the quant tables collapse to 1), encode/decode
round-trips bound the error on smooth content, restart/subsampling/
grayscale paths are exercised, and malformed-vs-unsupported classification
is pinned. Progressive is verified by bit-reorder identity:
decode_jpeg(encode_jpeg_progressive(x)) must equal
decode_jpeg(encode_jpeg(x)) EXACTLY — progressive coding permutes the
entropy bits but not the coefficients, so any scan-logic slip desyncs the
huffman stream and fails loudly rather than approximately.
External-decoder compatibility of encoded files cannot be
tested in this container (no image library by design) — the files are
standard-conformant by construction and self-describing.

Reference analog: none — the reference is tabular-only; this extends the
LLM-training-data multimodal operator set (SURVEY.md §2 extension).
"""

from __future__ import annotations

import numpy as np

# Zigzag scan order (T.81 figure 5): index i in the coefficient stream
# lands at flat position ZIGZAG[i] of the row-major 8x8 block.
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex-K EXAMPLE quantization tables (published in T.81 §K.1 as typical
# tables — example data, not an entropy-coding constant to misremember).
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _dct_basis() -> np.ndarray:
    """Orthonormal DCT-II basis C (8x8): forward F = C x Ct, inverse
    x = Ct F C. One constant matrix; blocks transform as two matmuls."""
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_basis()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg-style linear quality scaling of the annex-K example tables
    (quality 50 = tables as published; 100 = all ones = near-lossless)."""
    q = min(max(int(quality), 1), 100)
    s = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((QUANT_LUM * s + 50) // 100, 1, 255)
    chroma = np.clip((QUANT_CHROMA * s + 50) // 100, 1, 255)
    return lum, chroma


# ------------------------------------------------------------- Huffman ------


def _build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman assignment (T.81 annex C): (length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over a destuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t raw bits to the signed coefficient value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(r: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 block of zigzag coefficients (DC prediction applied)."""
    coeffs = np.zeros(64, dtype=np.int64)
    t = r.read_symbol(dc_tab)
    diff = _extend(r.read_bits(t), t)
    pred += diff
    coeffs[0] = pred
    k = 1
    while k < 64:
        rs = r.read_symbol(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:                # ZRL: sixteen zeros
                k += 16
                continue
            break                        # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run beyond block")
        coeffs[k] = _extend(r.read_bits(size), size)
        k += 1
    block = np.zeros(64, dtype=np.int64)
    block[ZIGZAG] = coeffs
    return block.reshape(8, 8), pred


def _split_entropy(blob: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy data from `start` to the next non-RST marker: returns the
    destuffed restart segments and the offset of the terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(blob)
    while i < n:
        b = blob[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = blob[i + 1]
        if m == 0x00:                    # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:          # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                            # real marker: scan ends
            segs.append(bytes(cur))
            return segs, i
    segs.append(bytes(cur))
    return segs, n


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB. ValueError = malformed stream;
    NotImplementedError = legal variant outside baseline sequential."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    i = 2
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = blob[i + 1]
        if marker == 0xD9:               # EOI before SOS
            break
        ln = int.from_bytes(blob[i + 2 : i + 4], "big")
        seg = blob[i + 4 : i + 2 + ln]
        if marker == 0xDB:               # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, j).astype(np.int64)
                    j += 64
                else:                    # 16-bit table
                    tbl = np.frombuffer(seg, ">u2", 64, j).astype(np.int64)
                    j += 128
                full = np.zeros(64, dtype=np.int64)
                full[ZIGZAG] = tbl       # DQT is stored in zigzag order
                qt[tq] = full.reshape(8, 8)
        elif marker == 0xC4:             # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                symbols = list(seg[j + 17 : j + 17 + total])
                huff[(tc, th)] = _build_decode_table(counts, symbols)
                j += 17 + total
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/SOF1 baseline
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc == 4:                  # CMYK/YCCK: a legal variant
                raise NotImplementedError("4-component JPEG (CMYK)")
            if nc not in (1, 3):
                raise ValueError(f"malformed JPEG: {nc} components")
            comps = []
            for c in range(nc):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + c * 3]))
            sof = (w, h, comps)
        elif marker == 0xC2:             # SOF2 progressive (huffman)
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"JPEG precision {precision}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc == 4:
                raise NotImplementedError("4-component JPEG (CMYK)")
            if nc not in (1, 3):
                raise ValueError(f"malformed JPEG: {nc} components")
            comps = []
            for c in range(nc):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + c * 3]))
            return _decode_progressive(
                blob, i + 2 + ln, (w, h, comps), qt, huff, restart_interval
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}: lossless/"
                f"arithmetic/hierarchical needs more than huffman DCT)"
            )
        elif marker == 0xDD:             # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:             # SOS: entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                tables = seg[2 + c * 2]
                scan.append((cs, tables >> 4, tables & 0x0F))
            if len(scan) != len(sof[2]):
                # T.81 permits baseline NON-interleaved files (one scan per
                # component) — a legal variant this decoder doesn't cover,
                # not a malformed stream
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG"
                )
            return _decode_scan(
                blob, i + 2 + ln, sof, scan, qt, huff, restart_interval
            )
        i += 2 + ln
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(blob, start, sof, scan, qt, huff, restart_interval):
    w, h, comps = sof
    if w <= 0 or h <= 0:
        raise ValueError("empty JPEG frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError(f"sampling factors {hmax}x{vmax}")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    scan_by_id = {cid: (dc, ac) for cid, dc, ac in scan}

    planes = {}
    for cid, ch, cv, tq in comps:
        pw, ph = mcux * 8 * ch, mcuy * 8 * cv
        planes[cid] = np.zeros((ph, pw), dtype=np.float64)
        if tq not in qt:
            raise ValueError(f"JPEG missing quant table {tq}")

    segs, _ = _split_entropy(blob, start)
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = {cid: 0 for cid, _, _, _ in comps}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                seg_idx += 1             # RSTn: new segment, reset DC
                if seg_idx >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                reader = _BitReader(segs[seg_idx])
                preds = {cid: 0 for cid, _, _, _ in comps}
            for cid, ch, cv, tq in comps:
                dc_id, ac_id = scan_by_id[cid]
                dc_tab = huff.get((0, dc_id))
                ac_tab = huff.get((1, ac_id))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG missing Huffman table")
                for by in range(cv):
                    for bx in range(ch):
                        block, preds[cid] = _decode_block(
                            reader, dc_tab, ac_tab, preds[cid]
                        )
                        spatial = _C.T @ (block * qt[tq]).astype(np.float64) @ _C
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu += 1

    out = []
    for cid, ch, cv, _ in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# -------------------------------------------------- progressive decode -----
# SOF2 (T.81 annex G, huffman): the frame's DCT coefficients arrive over
# MULTIPLE scans — spectral selection (each AC scan carries one zigzag band
# of one component; DC scans may interleave components) and successive
# approximation (first scan sends coefficients point-transformed down by
# Al bits, later scans refine one bit plane at a time). Decoding therefore
# accumulates integer coefficients per block across scans and runs the
# dequantize + IDCT once at EOI. The refinement control flow mirrors the
# published algorithm (T.81 G.1.2.3 / the libjpeg reference decoder's
# structure): correction bits for already-nonzero coefficients are
# interleaved with the run/size symbols, and EOB runs cover whole blocks.


def _prog_dc_first(reader, vec, pred: int, dc_tab: dict, al: int) -> int:
    t = reader.read_symbol(dc_tab)
    pred += _extend(reader.read_bits(t), t)
    vec[0] = pred << al
    return pred


def _prog_ac_first(reader, vec, ss: int, se: int, al: int,
                   ac_tab: dict, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:                  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1        # EOBn: this block + eobrun more
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC run beyond spectral band")
        vec[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _prog_ac_refine(reader, vec, ss: int, se: int, al: int,
                    ac_tab: dict, eobrun: int) -> int:
    """One block of AC successive-approximation refinement. Newly
    significant coefficients arrive as (run, size=1) symbols whose run
    counts only ZERO-HISTORY positions; already-significant coefficients
    passed along the way each contribute one correction bit. Bitwise ops
    on the signed values are two's-complement-correct in Python exactly as
    in C (x | p1 / x & p1 behave identically for negatives)."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(ac_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    # NOT the AC-first (1<<r)-1 form: here the current
                    # block still owes its tail refinement below, and THAT
                    # path consumes one unit of the run
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break                # rest of block refined below
                val = 0                  # ZRL: skip 16 zero-history coeffs
            elif s == 1:
                val = p1 if reader.read_bit() else m1
            else:
                raise ValueError("JPEG AC refinement size > 1")
            while k <= se:
                if vec[k] != 0:          # history: correction bit
                    if reader.read_bit() and (vec[k] & p1) == 0:
                        vec[k] += p1 if vec[k] >= 0 else m1
                else:
                    if r == 0:
                        break            # the target zero-history slot
                    r -= 1
                k += 1
            if k > se:
                break
            if val != 0:
                vec[k] = val
            k += 1
    if eobrun > 0:                       # EOB-covered tail: refine history
        while k <= se:
            if vec[k] != 0:
                if reader.read_bit() and (vec[k] & p1) == 0:
                    vec[k] += p1 if vec[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(blob, i, sof, qt, huff, restart_interval):
    """Marker walk + scan accumulation from the first post-SOF2 offset to
    EOI, then one dequantize/IDCT/assembly pass. DQT/DHT/DRI segments may
    appear BETWEEN scans and take effect for subsequent ones."""
    w, h, comps = sof
    if w <= 0 or h <= 0:
        raise ValueError("empty JPEG frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError(f"sampling factors {hmax}x{vmax}")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per component: padded (MCU-aligned) block grid for interleaved DC
    # scans; tight grid (ceil of the component's own sample dims / 8) for
    # non-interleaved scans (T.81 A.2.2 vs A.2.3)
    grid = {}
    coef = {}
    for cid, ch, cv, tq in comps:
        mbw, mbh = mcux * ch, mcuy * cv
        nbw = -(-(-(-w * ch // hmax)) // 8)
        nbh = -(-(-(-h * cv // vmax)) // 8)
        grid[cid] = (mbw, mbh, nbw, nbh)
        coef[cid] = np.zeros((mbh, mbw, 64), dtype=np.int64)
    by_id = {cid: (cid, ch, cv, tq) for cid, ch, cv, tq in comps}

    n = len(blob)
    saw_scan = False
    while i + 2 <= n:
        if blob[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = blob[i + 1]
        if marker == 0xD9:               # EOI
            break
        if i + 4 > n:
            raise ValueError("JPEG truncated marker segment")
        ln = int.from_bytes(blob[i + 2 : i + 4], "big")
        seg = blob[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, j).astype(np.int64)
                    j += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, j).astype(np.int64)
                    j += 128
                full = np.zeros(64, dtype=np.int64)
                full[ZIGZAG] = tbl
                qt[tq] = full.reshape(8, 8)
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = list(seg[j + 1 : j + 17])
                total = sum(counts)
                symbols = list(seg[j + 17 : j + 17 + total])
                huff[(tc, th)] = _build_decode_table(counts, symbols)
                j += 17 + total
        elif marker == 0xDD:
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:
            saw_scan = True
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs = seg[1 + c * 2]
                tables = seg[2 + c * 2]
                if cs not in by_id:
                    raise ValueError(f"JPEG scan names unknown component {cs}")
                sel.append((cs, tables >> 4, tables & 0x0F))
            ss, se = seg[1 + ns * 2], seg[2 + ns * 2]
            ah, al = seg[3 + ns * 2] >> 4, seg[3 + ns * 2] & 0x0F
            i = _decode_prog_scan(
                blob, i + 2 + ln, sel, ss, se, ah, al,
                by_id, grid, coef, huff, restart_interval,
                mcux, mcuy,
            )
            continue
        # APPn / COM / other: skip
        i += 2 + ln
    if not saw_scan:
        raise ValueError("JPEG has no SOS scan")

    planes = {}
    for cid, ch, cv, tq in comps:
        if tq not in qt:
            raise ValueError(f"JPEG missing quant table {tq}")
        mbw, mbh, _, _ = grid[cid]
        plane = np.zeros((mbh * 8, mbw * 8), dtype=np.float64)
        q = qt[tq]
        for by in range(mbh):
            for bx in range(mbw):
                block = np.zeros(64, dtype=np.int64)
                block[ZIGZAG] = coef[cid][by, bx]
                blk = block.reshape(8, 8) * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ blk.astype(np.float64) @ _C
                )
        planes[cid] = plane

    out = []
    for cid, ch, cv, _ in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _decode_prog_scan(blob, start, sel, ss, se, ah, al, by_id, grid, coef,
                      huff, restart_interval, mcux, mcuy):
    """Decode one progressive scan's entropy data; returns the offset of
    the marker that terminated it. Restart markers reset the DC
    predictors AND the EOB run."""
    segs, end = _split_entropy(blob, start)
    if ss == 0 and se != 0:
        raise ValueError("JPEG DC scan with Se != 0")
    if ss > 0 and len(sel) != 1:
        raise ValueError("JPEG AC scan must be non-interleaved")
    if ss > se or se > 63:
        raise ValueError("JPEG bad spectral band")

    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = {cid: 0 for cid, _, _ in sel}
    eobrun = 0

    def restart():
        nonlocal seg_idx, reader, preds, eobrun
        seg_idx += 1
        if seg_idx >= len(segs):
            raise ValueError("JPEG missing restart segment")
        reader = _BitReader(segs[seg_idx])
        preds = {cid: 0 for cid, _, _ in sel}
        eobrun = 0

    interleaved = len(sel) > 1
    if ss == 0:
        # DC scan — interleaved over MCUs, or raster over the single
        # component's tight grid
        if interleaved:
            unit_iter = range(mcux * mcuy)
        else:
            cid = sel[0][0]
            _, _, nbw, nbh = grid[cid]
            unit_iter = range(nbw * nbh)
        for unit in unit_iter:
            if restart_interval and unit and unit % restart_interval == 0:
                restart()
            for cid, td, _ta in sel:
                _, ch, cv, _ = by_id[cid]
                if interleaved:
                    mx, my = unit % mcux, unit // mcux
                    blocks = [
                        ((my * cv + by2), (mx * ch + bx2))
                        for by2 in range(cv) for bx2 in range(ch)
                    ]
                else:
                    _, _, nbw, nbh = grid[cid]
                    blocks = [(unit // nbw, unit % nbw)]
                for by2, bx2 in blocks:
                    vec = coef[cid][by2, bx2]
                    if ah == 0:
                        dc_tab = huff.get((0, td))
                        if dc_tab is None:
                            raise ValueError("JPEG missing Huffman table")
                        preds[cid] = _prog_dc_first(
                            reader, vec, preds[cid], dc_tab, al
                        )
                    else:                # DC refinement: one raw bit
                        vec[0] |= reader.read_bit() << al
    else:
        cid, _td, ta = sel[0]
        ac_tab = huff.get((1, ta))
        if ac_tab is None:
            raise ValueError("JPEG missing Huffman table")
        _, _, nbw, nbh = grid[cid]
        for unit in range(nbw * nbh):
            if restart_interval and unit and unit % restart_interval == 0:
                restart()
            vec = coef[cid][unit // nbw, unit % nbw]
            if ah == 0:
                eobrun = _prog_ac_first(reader, vec, ss, se, al, ac_tab,
                                        eobrun)
            else:
                eobrun = _prog_ac_refine(reader, vec, ss, se, al, ac_tab,
                                         eobrun)
    return end


# -------------------------------------------------------------- encoder -----

# Self-describing equal-length canonical tables (see module docstring):
# DC symbols 0..11 as 4-bit codes; AC symbols (all 162 baseline run/size
# bytes, numerically sorted) as 8-bit codes. Both sizes leave the all-ones
# code of their length unused (12 <= 15, 162 <= 255), as T.81 requires.
_DC_SYMS = list(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_SYMS = sorted(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8


def _encode_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, code), canonical assignment (inverse of decode)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _encode_codes(_DC_COUNTS, _DC_SYMS)
_AC_CODES = _encode_codes(_AC_COUNTS, _AC_SYMS)


class _BitWriter:
    __slots__ = ("out", "acc", "bits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.bits += 1
            if self.bits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:     # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.bits = 0

    def flush(self) -> None:
        if self.bits:
            self.write((1 << (8 - self.bits)) - 1, 8 - self.bits)  # pad 1s


def _encode_block(wtr: _BitWriter, block: np.ndarray, pred: int) -> int:
    """Quantized 8x8 block → DC diff + AC run-length symbols."""
    zz = block.reshape(-1)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred

    def _mag(v: int) -> tuple[int, int]:
        t = abs(v).bit_length()
        raw = v if v >= 0 else v + (1 << t) - 1
        return t, raw

    t, raw = _mag(diff)
    ln, code = _DC_CODES[t]
    wtr.write(code, ln)
    if t:
        wtr.write(raw, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODES[0xF0]   # ZRL
            wtr.write(code, ln)
            run -= 16
        t, raw = _mag(v)
        ln, code = _AC_CODES[(run << 4) | t]
        wtr.write(code, ln)
        wtr.write(raw, t)
        run = 0
    if run:
        ln, code = _AC_CODES[0x00]       # EOB
        wtr.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, q: np.ndarray, wtr: _BitWriter,
                  pred: int, y0: int, x0: int) -> int:
    block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
    coeffs = _C @ block @ _C.T
    quant = np.rint(coeffs / q).astype(np.int64)
    return _encode_block(wtr, quant, pred)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def _dht_segment(tc: int, th: int, counts: list[int], syms: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = table.reshape(-1)[ZIGZAG].astype(np.uint8)
    body = bytes([tq]) + zz.tobytes()
    return b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(rgb: np.ndarray, quality: int = 90,
                subsample: bool = False, restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF JPEG (4:4:4, or 4:2:0 box-
    averaged chroma with subsample=True; optional DRI/RSTn restart
    markers). Deterministic; inverse of decode_jpeg up to quantization
    error (exact for flat fields at quality 100)."""
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    x = rgb.astype(np.float64)
    y = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    cb = 128.0 - 0.168736 * x[:, :, 0] - 0.331264 * x[:, :, 1] + 0.5 * x[:, :, 2]
    cr = 128.0 + 0.5 * x[:, :, 0] - 0.418688 * x[:, :, 1] - 0.081312 * x[:, :, 2]

    qlum, qchr = _quality_tables(quality)
    cf = 2 if subsample else 1
    ypad = _pad_to(y, 8 * cf, 8 * cf)
    if subsample:                        # 2x2 box average
        ph, pw = ypad.shape
        cbp = _pad_to(cb, 16, 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = _pad_to(cr, 16, 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cbp = _pad_to(cb, 8, 8)
        crp = _pad_to(cr, 8, 8)

    wtr = _BitWriter()
    mcux = ypad.shape[1] // (8 * cf)
    mcuy = ypad.shape[0] // (8 * cf)
    py = pcb = pcr = 0
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.flush()              # byte-align, pad with 1s
                wtr.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                py = pcb = pcr = 0       # RSTn resets DC prediction
            for by in range(cf):
                for bx in range(cf):
                    py = _plane_blocks(
                        ypad, qlum, wtr, py,
                        (my * cf + by) * 8, (mx * cf + bx) * 8,
                    )
            pcb = _plane_blocks(cbp, qchr, wtr, pcb, my * 8, mx * 8)
            pcr = _plane_blocks(crp, qchr, wtr, pcr, my * 8, mx * 8)
            mcu += 1
    wtr.flush()

    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + bytes([1, (cf << 4) | cf, 0])  # Y
        + bytes([2, 0x11, 1])            # Cb
        + bytes([3, 0x11, 1])            # Cr
    )
    sos = (
        b"\xff\xda" + (12).to_bytes(2, "big") + bytes([3])
        + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    )
    dri = (
        b"\xff\xdd" + (4).to_bytes(2, "big")
        + restart_interval.to_bytes(2, "big")
    ) if restart_interval else b""
    app0 = (
        b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
        + bytes([1, 1, 0]) + (1).to_bytes(2, "big") + (1).to_bytes(2, "big")
        + bytes([0, 0])
    )
    return (
        b"\xff\xd8" + app0
        + _dqt_segment(0, qlum) + _dqt_segment(1, qchr)
        + sof
        + _dht_segment(0, 0, _DC_COUNTS, _DC_SYMS)
        + _dht_segment(1, 0, _AC_COUNTS, _AC_SYMS)
        + _dht_segment(0, 1, _DC_COUNTS, _DC_SYMS)
        + _dht_segment(1, 1, _AC_COUNTS, _AC_SYMS)
        + dri + sos + bytes(wtr.out) + b"\xff\xd9"
    )


# -------------------------------------------- progressive encoder -----------
# SOF2 emitter (spectral selection + successive approximation), the inverse
# of _decode_progressive and the self-verification path for it: progressive
# coding only REORDERS the entropy bits — the dequantized coefficients are
# identical to the baseline encoding of the same image, so
# decode_jpeg(encode_jpeg_progressive(x)) must equal
# decode_jpeg(encode_jpeg(x)) EXACTLY, pixel for pixel (the round-trip test
# in tests/test_multimodal_jpeg.py). Same self-describing equal-length
# huffman discipline as the baseline encoder; the progressive AC alphabet
# adds the EOBn symbols (r<<4 | 0 for r<15), so it gets its own table.

_PAC_SYMS = sorted((r << 4) | s for r in range(16) for s in range(11))
_PAC_COUNTS = [0] * 7 + [len(_PAC_SYMS)] + [0] * 8
_PAC_CODES = _encode_codes(_PAC_COUNTS, _PAC_SYMS)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: magnitude shift (toward zero), T.81 G.1.2.2."""
    return v >> al if v >= 0 else -((-v) >> al)


def _enc_ac_first(wtr: _BitWriter, blocks, ss: int, se: int, al: int) -> None:
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            t = eobrun.bit_length() - 1
            ln, code = _PAC_CODES[t << 4]
            wtr.write(code, ln)
            if t:
                wtr.write(eobrun - (1 << t), t)
            eobrun = 0

    for vec in blocks:
        vals = [_pt_ac(int(vec[k]), al) for k in range(ss, se + 1)]
        last = -1
        for idx, v in enumerate(vals):
            if v:
                last = idx
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for idx in range(last + 1):
            v = vals[idx]
            if v == 0:
                r += 1
                continue
            while r > 15:
                ln, code = _PAC_CODES[0xF0]
                wtr.write(code, ln)
                r -= 16
            t = abs(v).bit_length()
            raw = v if v >= 0 else v + (1 << t) - 1
            ln, code = _PAC_CODES[(r << 4) | t]
            wtr.write(code, ln)
            wtr.write(raw, t)
            r = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(wtr: _BitWriter, blocks, ss: int, se: int,
                   al: int) -> None:
    """AC successive-approximation refinement emitter — the mirror of
    _prog_ac_refine (T.81 G.1.2.3; control flow per the public libjpeg
    reference encoder): correction bits of already-significant
    coefficients are buffered and ride immediately after the next emitted
    symbol (newly-significant, ZRL, or EOBn)."""
    eobrun = 0
    gbuf: list[int] = []                 # bits owed after the next EOBn

    def flush_eob() -> None:
        nonlocal eobrun, gbuf
        if eobrun:
            t = eobrun.bit_length() - 1
            ln, code = _PAC_CODES[t << 4]
            wtr.write(code, ln)
            if t:
                wtr.write(eobrun - (1 << t), t)
            for b in gbuf:
                wtr.write(b, 1)
            gbuf = []
            eobrun = 0

    for vec in blocks:
        absv = []
        eob = -1                         # last NEWLY-significant index
        for k in range(ss, se + 1):
            v = int(vec[k])
            a = (v if v >= 0 else -v) >> al
            absv.append(a)
            if a == 1:
                eob = k - ss
        r = 0
        br: list[int] = []               # bits since the last symbol
        for idx in range(se - ss + 1):
            a = absv[idx]
            if a == 0:
                r += 1
                continue
            while r > 15 and idx <= eob:
                flush_eob()
                ln, code = _PAC_CODES[0xF0]
                wtr.write(code, ln)
                r -= 16
                for b in br:
                    wtr.write(b, 1)
                br = []
            if a > 1:                    # history coeff: one correction bit
                br.append(a & 1)
                continue
            flush_eob()                  # newly significant at this slot
            v = int(vec[ss + idx])
            ln, code = _PAC_CODES[(r << 4) | 1]
            wtr.write(code, ln)
            wtr.write(0 if v < 0 else 1, 1)
            for b in br:
                wtr.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            gbuf.extend(br)
            if eobrun == 0x7FFF or len(gbuf) > 900:
                flush_eob()
    flush_eob()


def _sos_segment(sel: list[tuple[int, int, int]], ss: int, se: int,
                 ah: int, al: int) -> bytes:
    body = bytes([len(sel)])
    for cid, td, ta in sel:
        body += bytes([cid, (td << 4) | ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + (len(body) + 2).to_bytes(2, "big") + body


def _group_mcus(flat, n_mcus):
    """Regroup the flat (cid, vec) stream into per-MCU lists."""
    flat = list(flat)
    per = len(flat) // n_mcus
    return [flat[i * per : (i + 1) * per] for i in range(n_mcus)]


def encode_jpeg_progressive(rgb: np.ndarray, quality: int = 90,
                            subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → progressive (SOF2) JFIF JPEG. Scan script:
    DC first (Al=1) interleaved; per-component AC bands first (Al=2, luma
    split 1-5 / 6-63); per-component AC refinement to Al=1; DC refinement;
    per-component AC refinement to Al=0 — exercising spectral selection
    AND two successive-approximation planes. Coefficients are identical to
    encode_jpeg's at the same (quality, subsample), so the decoded pixels
    of the two encodings must match exactly. restart_interval > 0 emits
    DRI + RSTn markers in EVERY scan (interval counted in MCUs for the
    interleaved DC scans, blocks for the non-interleaved AC scans — the
    T.81 MCU definition makes those the same unit), resetting DC
    predictors and EOB runs per segment."""
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    x = rgb.astype(np.float64)
    y = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    cb = 128.0 - 0.168736 * x[:, :, 0] - 0.331264 * x[:, :, 1] + 0.5 * x[:, :, 2]
    cr = 128.0 + 0.5 * x[:, :, 0] - 0.418688 * x[:, :, 1] - 0.081312 * x[:, :, 2]

    qlum, qchr = _quality_tables(quality)
    cf = 2 if subsample else 1
    ypad = _pad_to(y, 8 * cf, 8 * cf)
    if subsample:
        ph, pw = ypad.shape
        cbp = _pad_to(cb, 16, 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = _pad_to(cr, 16, 16).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        cbp = _pad_to(cb, 8, 8)
        crp = _pad_to(cr, 8, 8)

    def comp_coef(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
        mbh, mbw = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.zeros((mbh, mbw, 64), dtype=np.int64)
        for by in range(mbh):
            for bx in range(mbw):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qz = np.rint((_C @ blk @ _C.T) / q).astype(np.int64)
                arr[by, bx] = qz.reshape(-1)[ZIGZAG]
        return arr

    coefs = {1: comp_coef(ypad, qlum), 2: comp_coef(cbp, qchr),
             3: comp_coef(crp, qchr)}
    samp = {1: (cf, cf), 2: (1, 1), 3: (1, 1)}
    mcux, mcuy = ypad.shape[1] // (8 * cf), ypad.shape[0] // (8 * cf)

    def tight(cid: int) -> tuple[int, int]:
        ch, cv = samp[cid]
        return (-(-(-(-w * ch // cf)) // 8), -(-(-(-h * cv // cf)) // 8))

    def ac_blocks(cid: int):
        nbw, nbh = tight(cid)
        arr = coefs[cid]
        for by in range(nbh):
            for bx in range(nbw):
                yield arr[by, bx]

    def mcu_blocks():
        """(cid, vec) in interleaved MCU order over the padded grids."""
        for my in range(mcuy):
            for mx in range(mcux):
                for cid in (1, 2, 3):
                    ch, cv = samp[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            yield cid, coefs[cid][my * cv + by, mx * ch + bx]

    scans: list[bytes] = []
    mcu_list = [list(g) for g in _group_mcus(mcu_blocks(), mcuy * mcux)]

    def segmented(n_units, enc_segment):
        """Split a scan's entropy data into restart intervals: fresh
        encoder state per segment (DC predictors / EOB runs reset at RSTn
        by definition), byte-aligned flush per segment, RST0-7 markers
        cycling between segments — mirrors _decode_prog_scan.restart()."""
        if not restart_interval or restart_interval >= n_units:
            return enc_segment(0, n_units)
        parts = []
        for seg, lo in enumerate(range(0, n_units, restart_interval)):
            if seg:
                parts.append(bytes([0xFF, 0xD0 + ((seg - 1) % 8)]))
            parts.append(
                enc_segment(lo, min(lo + restart_interval, n_units))
            )
        return b"".join(parts)

    def dc_first_seg(lo, hi):
        wtr = _BitWriter()
        preds = {1: 0, 2: 0, 3: 0}
        for mcu in mcu_list[lo:hi]:
            for cid, vec in mcu:
                val = int(vec[0]) >> 1
                diff = val - preds[cid]
                preds[cid] = val
                t = abs(diff).bit_length()
                raw = diff if diff >= 0 else diff + (1 << t) - 1
                ln, code = _DC_CODES[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(raw, t)
        wtr.flush()
        return bytes(wtr.out)

    def dc_refine_seg(lo, hi):
        wtr = _BitWriter()
        for mcu in mcu_list[lo:hi]:
            for _cid, vec in mcu:
                wtr.write(int(vec[0]) & 1, 1)
        wtr.flush()
        return bytes(wtr.out)

    def ac_seg(blocks, enc, ss, se, al):
        def run(lo, hi):
            wtr = _BitWriter()
            enc(wtr, blocks[lo:hi], ss, se, al)
            wtr.flush()
            return bytes(wtr.out)

        return run

    # scan 1: DC first, interleaved, Al=1 (arithmetic point transform)
    scans.append(
        _sos_segment([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1)
        + segmented(len(mcu_list), dc_first_seg)
    )

    # scans 2-5: AC first, Al=2 (luma split into two bands)
    for cid, ta, bands in ((1, 0, ((1, 5), (6, 63))),
                           (2, 1, ((1, 63),)), (3, 1, ((1, 63),))):
        blocks = list(ac_blocks(cid))
        for ss, se in bands:
            scans.append(
                _sos_segment([(cid, 0, ta)], ss, se, 0, 2)
                + segmented(len(blocks),
                            ac_seg(blocks, _enc_ac_first, ss, se, 2))
            )

    # scans 6-8: AC refinement Ah=2 -> Al=1
    for cid, ta in ((1, 0), (2, 1), (3, 1)):
        blocks = list(ac_blocks(cid))
        scans.append(
            _sos_segment([(cid, 0, ta)], 1, 63, 2, 1)
            + segmented(len(blocks),
                        ac_seg(blocks, _enc_ac_refine, 1, 63, 1))
        )

    # scan 9: DC refinement Ah=1 -> Al=0 (one raw bit per block)
    scans.append(
        _sos_segment([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0)
        + segmented(len(mcu_list), dc_refine_seg)
    )

    # scans 10-12: AC refinement Ah=1 -> Al=0
    for cid, ta in ((1, 0), (2, 1), (3, 1)):
        blocks = list(ac_blocks(cid))
        scans.append(
            _sos_segment([(cid, 0, ta)], 1, 63, 1, 0)
            + segmented(len(blocks),
                        ac_seg(blocks, _enc_ac_refine, 1, 63, 0))
        )

    sof2 = (
        b"\xff\xc2" + (17).to_bytes(2, "big") + bytes([8])
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + bytes([1, (cf << 4) | cf, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1])
    )
    app0 = (
        b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
        + bytes([1, 1, 0]) + (1).to_bytes(2, "big") + (1).to_bytes(2, "big")
        + bytes([0, 0])
    )
    dri = (
        b"\xff\xdd" + (4).to_bytes(2, "big")
        + restart_interval.to_bytes(2, "big")
    ) if restart_interval else b""
    return (
        b"\xff\xd8" + app0
        + _dqt_segment(0, qlum) + _dqt_segment(1, qchr)
        + sof2
        + _dht_segment(0, 0, _DC_COUNTS, _DC_SYMS)
        + _dht_segment(0, 1, _DC_COUNTS, _DC_SYMS)
        + _dht_segment(1, 0, _PAC_COUNTS, _PAC_SYMS)
        + _dht_segment(1, 1, _PAC_COUNTS, _PAC_SYMS)
        + dri + b"".join(scans) + b"\xff\xd9"
    )
