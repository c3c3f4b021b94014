"""From-scratch JPEG codec (no PIL/libjpeg in this container).

Real web crawls carry JPEG images overwhelmingly more often than PNG,
so the multimodal image column needs this codec to be REAL: ``decode``
parses the public JFIF/JPEG wire format — marker segments, quantization
tables (DQT), frame headers, canonical Huffman tables (DHT), the
entropy-coded scans with 0xFF00 byte stuffing and RSTn restart
intervals — and supports BOTH baseline sequential DCT (SOF0/SOF1,
single- or multi-scan, interleaved or per-component scans) AND
progressive (SOF2: spectral selection + successive approximation with
EOBn end-of-band runs, T.81 Annex G — the dominant variant among real
crawl JPEGs). Scans scatter quantized coefficients into per-component
stores; one batched dequant + matmul IDCT at EOI produces pixels
(chroma upsampling by sampling factors, JFIF YCbCr→RGB). The
per-symbol entropy loop is the only python-serial part and runs on a
16-bit-peek Huffman LUT over precomputed 32-bit bit windows.

``encode`` writes valid baseline streams (Annex K tables; grayscale,
4:4:4, 4:2:2 or 4:2:0; optional RSTn) and, with ``progressive=True``,
a multi-scan SOF2 stream with per-scan frequency-optimized Huffman
tables (built by the T.81 Annex K.2 algorithm) whose decoded output is
bit-identical to the baseline encoding of the same image.

Fail-loud outside the subset: arithmetic coding (DAC), hierarchical,
lossless, 12-bit, CMYK raise ``JpegFormatError`` — never a silent
wrong image.

JPEG is lossy: correctness is pinned by (a) hand-assembled baseline
AND progressive streams whose pixel output is analytically derivable
(tests/test_jpeg.py), (b) an independent O(N^4) direct-sum IDCT
oracle, (c) encode→decode error bounds on random images, and (d) the
progressive==baseline bit-identity invariant.

Reference analog: the reference ships no image pipeline of its own
(external libs only); this is the container-native equivalent for the
training-data pipeline's multimodal columns, like functions/png.py.
"""

from __future__ import annotations

import struct

import numpy as np

from . import _native


class JpegFormatError(ValueError):
    """Malformed or out-of-subset JPEG input."""


# zigzag scan order: ZIGZAG[i] = row-major index of the i-th coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU T.81 Annex K quantization tables (quality-50 reference)
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)  # row-major
STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman tables: (BITS[1..16], HUFFVAL)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# orthonormal 8-point DCT-II basis: JPEG FDCT = T f T^T, IDCT = T^T F T
_T = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks → (n, 8, 8) spatial
    samples (level-shifted domain, i.e. centered on 0)."""
    return np.einsum("ux,nuv,vy->nxy", _T, coeffs, _T, optimize=True)


def fdct_blocks(samples: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _T, samples, _T, optimize=True)


# --- fast entropy machinery -------------------------------------------------
#
# The scan decode is the only serial stage, so it gets the fast path:
# (a) a 16-bit-peek Huffman LUT (one list index replaces up to 16
# bit-by-bit tree steps), and (b) a precomputed 32-bit big-endian
# window per byte offset, so "read n bits at bit position p" is one
# shift+mask on a plain python int. Both operate on the UNSTUFFED
# entropy segment.

# generous zero padding: one block consumes at most ~1665 bits
# (DC 16+11 + 63 AC * (16+10)), and overrun is checked once per block,
# so the window array only ever gets indexed ~209 bytes past the end
_PAD = 256

_EXT_MASK = tuple((1 << t) - 1 for t in range(17))
_EXT_HALF = tuple(1 << (t - 1) if t else 0 for t in range(17))


def _window32(seg: bytes) -> tuple[list[int], int]:
    """(windows, total_bits): windows[i] = 32 bits of ``seg`` starting
    at byte i, big-endian, zero-padded past the end."""
    a = np.frombuffer(seg + b"\x00" * _PAD, np.uint8).astype(np.uint32)
    w = (a[:-3] << 24) | (a[1:-2] << 16) | (a[2:-1] << 8) | a[3:]
    return w.tolist(), 8 * len(seg)


_LUT_CACHE: dict[bytes, list[int]] = {}
_LUT_NP_CACHE: dict[bytes, np.ndarray] = {}


def _huff_lut_np(table) -> np.ndarray:
    """(BITS, HUFFVAL) → 65536-entry int32 LUT array:
    lut[peek16] = (value<<5)|len, 0 for invalid prefixes (T.81
    canonical code assignment)."""
    bits, values = table
    key = bytes(bits) + bytes(values)
    arr = _LUT_NP_CACHE.get(key)
    if arr is None:
        if len(_LUT_NP_CACHE) > 64:
            _LUT_NP_CACHE.clear()
        arr = np.zeros(1 << 16, np.int32)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                base = code << (16 - ln)
                arr[base : base + (1 << (16 - ln))] = (values[k] << 5) | ln
                code += 1
                k += 1
            code <<= 1
        _LUT_NP_CACHE[key] = arr
    return arr


def _huff_lut(table) -> list[int]:
    """List form of :func:`_huff_lut_np` for the pure-Python bit loop
    (plain-int indexing is ~2× faster than numpy scalar indexing)."""
    bits, values = table
    key = bytes(bits) + bytes(values)
    lut = _LUT_CACHE.get(key)
    if lut is None:
        if len(_LUT_CACHE) > 64:
            _LUT_CACHE.clear()
        lut = _huff_lut_np(table).tolist()
        _LUT_CACHE[key] = lut
    return lut


def _split_entropy_segments(data: bytes, start: int):
    """Entropy-coded bytes from ``start`` → (segments, end_pos):
    0xFF00 unstuffed, segments split at RSTn markers, stop at any
    other marker. Jumps between 0xFF sightings with bytes.find —
    no per-byte python loop."""
    segs = []
    cur = bytearray()
    i = start
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0:
            cur += data[i:]
            i = n
            break
        cur += data[i:j]
        if j + 1 >= n:
            i = j
            break
        m = data[j + 1]
        if m == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: new segment, reset predictors
            segs.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            i = j
            break
    segs.append(bytes(cur))
    return segs, i


class _Frame:
    """Parsed SOF + per-component coefficient accumulators (zigzag
    order, flat): decoding is "scatter coefficients from every scan,
    then one batched dequant+IDCT at EOI" — the same model covers
    baseline single-scan, baseline multi-scan (one component per SOS),
    and progressive (SOF2) spectral-selection / successive-approximation
    scans (T.81 G.1.2)."""

    def __init__(self, h, w, comps, progressive):
        self.h, self.w = h, w
        self.comps = comps
        self.progressive = progressive
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        for c in comps:
            if c["h"] not in (1, 2, 4) or c["v"] not in (1, 2, 4):
                raise JpegFormatError("sampling factors must be 1, 2 or 4")
            if self.hmax % c["h"] or self.vmax % c["v"]:
                raise JpegFormatError("non-divisible sampling factors")
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        # flat (rows*cols*64) per component; rows/cols MCU-aligned
        self.coef = []
        for c in comps:
            rows, cols = self.mcus_y * c["v"], self.mcus_x * c["h"]
            c["rows"], c["cols"] = rows, cols
            # true block dims for non-interleaved scans (T.81 A.2.2):
            # ceil(ceil(dim * factor / max_factor) / 8)
            cw = -(-(w * c["h"]) // self.hmax)
            ch = -(-(h * c["v"]) // self.vmax)
            c["bx"] = -(-cw // 8)
            c["by"] = -(-ch // 8)
            self.coef.append(np.zeros(rows * cols * 64, np.int32))
        self.dc_seen = set()

    def sched(self, scomps):
        """Block schedule for one scan: (units_x, units_y, entries) with
        entries = (ci, A, B, C, td, ta) s.t. a unit at (uy, ux) touches
        flat block offset uy*A + ux*B + C (T.81 A.2.3: interleaved MCU
        raster for ns>1, the component's own block raster for ns=1)."""
        if len(scomps) == 1:
            ci, c, td, ta = scomps[0]
            cols = c["cols"]
            return c["bx"], c["by"], [(ci, cols * 64, 64, 0, td, ta)]
        entries = []
        for ci, c, td, ta in scomps:
            cols = c["cols"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    entries.append((
                        ci, c["v"] * cols * 64, c["h"] * 64,
                        (by * cols + bx) * 64, td, ta,
                    ))
        return self.mcus_x, self.mcus_y, entries


def decode(data: bytes, *, default_huff: bool = False) -> np.ndarray:
    """JPEG bytes → (height, width, channels) uint8 (channels 1 or 3).

    Accepts baseline sequential (SOF0/SOF1, single- or multi-scan,
    interleaved or per-component scans, RSTn restart intervals) AND
    progressive (SOF2, spectral selection + successive approximation).
    Fail-loud outside the subset: arithmetic coding, hierarchical,
    lossless, 12-bit, CMYK.

    ``default_huff`` pre-seeds the Annex K Huffman tables (ids 0=luma,
    1=chroma) for streams that omit DHT — the common MJPEG-in-AVI
    convention; in-stream DHT segments override the seeds."""
    if data[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    if default_huff:
        huff_dc = {0: STD_DC_LUMA, 1: STD_DC_CHROMA}
        huff_ac = {0: STD_AC_LUMA, 1: STD_AC_CHROMA}
    frame: _Frame | None = None
    restart_interval = 0
    nscans = 0
    saw_eoi = False
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise JpegFormatError(f"expected marker at {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker.
        while i < n and data[i] == 0xFF:
            i += 1
        if i >= n:
            raise JpegFormatError("truncated marker")
        marker = data[i]
        i += 1
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn
            continue
        if i + 2 > n:
            raise JpegFormatError("truncated segment length")
        (seglen,) = struct.unpack_from(">H", data, i)
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int32)
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = zz  # stored in zigzag order
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = (bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progr.
            if frame is not None:
                raise JpegFormatError("multiple frames unsupported")
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise JpegFormatError(f"{prec}-bit samples unsupported")
            if nc not in (1, 3):
                raise JpegFormatError(f"{nc}-component images unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = _Frame(h, w, comps, progressive=(marker == 0xC2))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                "only baseline sequential (SOF0/SOF1) and progressive "
                "(SOF2) are supported"
            )
        elif marker == 0xCC:
            raise JpegFormatError("arithmetic coding unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            if not seg or len(seg) < 4 + 2 * seg[0]:
                raise JpegFormatError("truncated SOS header")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                for ci, comp in enumerate(frame.comps):
                    if comp["id"] == cs:
                        scomps.append((ci, comp, tt >> 4, tt & 15))
                        break
                else:
                    raise JpegFormatError(f"scan references unknown comp {cs}")
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 15
            segs, i = _split_entropy_segments(data, i + seglen)
            _decode_one_scan(
                frame, scomps, ss, se, ah, al, segs, huff_dc, huff_ac,
                restart_interval,
            )
            nscans += 1
            continue
        # APPn/COM/DNL/etc: skip
        i += seglen
    if nscans == 0:
        raise JpegFormatError("no SOS marker found")
    if not saw_eoi:
        raise JpegFormatError("truncated stream (no EOI)")
    missing = set(range(len(frame.comps))) - frame.dc_seen
    if missing:
        raise JpegFormatError(f"components never scanned: {sorted(missing)}")
    return _assemble(frame, qt)


def _decode_one_scan(frame, scomps, ss, se, ah, al, segs, huff_dc, huff_ac,
                     restart_interval):
    """Dispatch one SOS to the right entropy decoder (T.81 G.1.2 scan
    taxonomy) and scatter its coefficients into the frame store."""
    need_dc = ss == 0 and (ah == 0 or not frame.progressive)
    need_ac = ss > 0 or not frame.progressive
    for _ci, _c2, td, ta in scomps:
        if need_dc and td not in huff_dc:
            raise JpegFormatError(f"missing DC Huffman table {td}")
        if need_ac and ta not in huff_ac:
            raise JpegFormatError(f"missing AC Huffman table {ta}")
    if not frame.progressive:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise JpegFormatError("invalid spectral params for sequential")
        ux, uy, entries = frame.sched(scomps)
        _scan_dc_ac(frame, entries, ux, uy, segs, huff_dc, huff_ac,
                    restart_interval, dc_only=False, al=0)
        frame.dc_seen.update(ci for ci, *_ in scomps)
        return
    if ss == 0:  # DC scan (interleaved allowed)
        if se != 0:
            raise JpegFormatError("progressive DC scan must have Se=0")
        ux, uy, entries = frame.sched(scomps)
        if ah == 0:
            _scan_dc_ac(frame, entries, ux, uy, segs, huff_dc, huff_ac,
                        restart_interval, dc_only=True, al=al)
            frame.dc_seen.update(ci for ci, *_ in scomps)
        else:
            _scan_dc_refine(frame, entries, ux, uy, segs,
                            restart_interval, al)
        return
    # AC scan: single component, non-interleaved (T.81 G.1.1.1)
    if len(scomps) != 1:
        raise JpegFormatError("progressive AC scan must be single-component")
    if not (1 <= ss <= se <= 63):
        raise JpegFormatError("invalid spectral band")
    ux, uy, entries = frame.sched(scomps)
    ci, _c, _td, ta = scomps[0]
    actab = huff_ac[ta]
    if ah == 0:
        _scan_ac_first(frame.coef[ci], entries[0], ux, uy, segs, actab,
                       restart_interval, ss, se, al)
    else:
        _scan_ac_refine(frame.coef[ci], entries[0], ux, uy, segs, actab,
                        restart_interval, ss, se, al)


def _seg_for(segs, si):
    if si >= len(segs):
        raise JpegFormatError("missing restart segment")
    return _window32(segs[si])


def _scan_dc_ac(frame, entries, ux, uy, segs, huff_dc, huff_ac, ri,
                dc_only, al):
    """Sequential scan (full band) or progressive first DC scan.
    Hot path: the C kernel when available (byte-identical port, guide
    §4.2 — the Huffman bit loop is the decode bottleneck and is
    inherently sequential); else LUT symbol decode + window bit reads,
    coefficient (index, value) pairs appended to python lists and
    scattered into the numpy store once at the end."""
    ncomp = len(frame.comps)
    if _native.get_lib() is not None:
        lut_list: list = []
        lut_pos: dict = {}

        def lidx(tbl):
            arr = _huff_lut_np(tbl)
            p = lut_pos.get(id(arr))
            if p is None:
                p = len(lut_list)
                lut_pos[id(arr)] = p
                lut_list.append(arr)
            return p

        ents_n = [
            (ci, a, b, c0, lidx(huff_dc[td]),
             -1 if dc_only else lidx(huff_ac[ta]))
            for ci, a, b, c0, td, ta in entries
        ]
        res = _native.jpeg_scan_dc_ac(
            segs, lut_list, ents_n, ncomp, ux, uy, int(ri or 0), al
        )
        if res is not None:
            comp_o, idx_o, val_o = res
            for ci in range(ncomp):
                m = comp_o == ci
                if m.any():
                    frame.coef[ci][idx_o[m]] = val_o[m]
            return
    idxs = [[] for _ in range(ncomp)]
    vals = [[] for _ in range(ncomp)]
    ents = []
    for ci, a, b, c0, td, ta in entries:
        dcl = _huff_lut(huff_dc[td])
        acl = None if dc_only else _huff_lut(huff_ac[ta])
        ents.append((ci, a, b, c0, dcl, acl,
                     idxs[ci].append, vals[ci].append))
    preds = [0] * ncomp
    n_units = ux * uy
    mask, half = _EXT_MASK, _EXT_HALF
    si = 0
    w, total = _seg_for(segs, 0)
    pos = 0
    muy = mux = 0
    for m in range(n_units):
        if ri and m and m % ri == 0:
            if pos > total:
                raise JpegFormatError("entropy data exhausted")
            si += 1
            w, total = _seg_for(segs, si)
            pos = 0
            for ci in range(ncomp):
                preds[ci] = 0
        for ci, a, b, c0, dcl, acl, ia, va in ents:
            bf = muy * a + mux * b + c0
            # DC: T.81 F.2.2.1 DECODE + EXTEND via LUT
            e = dcl[(w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
            ln = e & 31
            if ln == 0:
                raise JpegFormatError("invalid Huffman code in scan")
            t = e >> 5
            pos += ln
            if t:
                v = (w[pos >> 3] >> (32 - (pos & 7) - t)) & mask[t]
                pos += t
                if v < half[t]:
                    v += 1 - (1 << t)
                preds[ci] += v
            ia(bf)
            va(preds[ci] << al)
            if acl is None:
                if pos > total:
                    raise JpegFormatError("entropy data exhausted")
                continue
            # AC run-length (F.2.2.2)
            k = 1
            while True:
                e = acl[(w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
                ln = e & 31
                if ln == 0:
                    raise JpegFormatError("invalid Huffman code in scan")
                pos += ln
                rs = e >> 5
                s = rs & 15
                if s:
                    k += rs >> 4
                    if k > 63:
                        raise JpegFormatError("AC run past block end")
                    v = (w[pos >> 3] >> (32 - (pos & 7) - s)) & mask[s]
                    pos += s
                    if v < half[s]:
                        v += 1 - (1 << s)
                    ia(bf + k)
                    va(v)
                    k += 1
                    if k == 64:
                        break
                elif rs == 0xF0:  # ZRL
                    k += 16
                    if k > 63:
                        raise JpegFormatError("ZRL past block end")
                else:  # EOB
                    break
            if pos > total:
                raise JpegFormatError("entropy data exhausted")
        mux += 1
        if mux == ux:
            mux = 0
            muy += 1
    if pos > total:
        raise JpegFormatError("entropy data exhausted")
    for ci in range(ncomp):
        if idxs[ci]:
            frame.coef[ci][np.asarray(idxs[ci], np.int64)] = np.asarray(
                vals[ci], np.int32
            )


def _scan_dc_refine(frame, entries, ux, uy, segs, ri, al):
    """Progressive DC refinement (T.81 G.1.2.1): one appended bit per
    block; OR-ing bit<<Al is exact two's-complement refinement of the
    arithmetic-shift point transform."""
    p1 = 1 << al
    n_units = ux * uy
    ne = len(entries)
    step = ri if ri else n_units
    for si, m0 in enumerate(range(0, n_units, step)):
        if si >= len(segs):
            raise JpegFormatError("missing restart segment")
        m1 = min(m0 + step, n_units)
        need = (m1 - m0) * ne
        bits = np.unpackbits(np.frombuffer(segs[si], np.uint8))
        if need > bits.size:
            raise JpegFormatError("entropy data exhausted")
        take = bits[:need].reshape(m1 - m0, ne)
        ms = np.arange(m0, m1, dtype=np.int64)
        muy, mux = ms // ux, ms % ux
        for e, (ci, a, b, c0, _td, _ta) in enumerate(entries):
            sel = take[:, e] == 1
            if sel.any():
                frame.coef[ci][muy[sel] * a + mux[sel] * b + c0] |= p1


def _scan_ac_first(coef, entry, ux, uy, segs, actab, ri, ss, se, al):
    """Progressive first AC scan for one band (T.81 G.1.2.2): run-length
    symbols as in sequential plus EOBn end-of-band run codes."""
    _ci, a, b, c0 = entry[0], entry[1], entry[2], entry[3]
    if _native.get_lib() is not None:
        res = _native.jpeg_scan_ac_first(
            segs, _huff_lut_np(actab), a, b, c0, ux, uy, int(ri or 0),
            ss, se, al,
        )
        if res is not None:
            idx_o, val_o = res
            if idx_o.size:
                coef[idx_o] = val_o
            return
    aclut = _huff_lut(actab)
    idx, val = [], []
    ia, va = idx.append, val.append
    eobrun = 0
    si = 0
    w, total = _seg_for(segs, 0)
    pos = 0
    for m in range(ux * uy):
        if ri and m and m % ri == 0:
            si += 1
            w, total = _seg_for(segs, si)
            pos = 0
            eobrun = 0
        if eobrun:
            eobrun -= 1
            continue
        muy, mux = divmod(m, ux)
        bf = muy * a + mux * b + c0
        k = ss
        while k <= se:
            e = aclut[(w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
            ln = e & 31
            if ln == 0:
                raise JpegFormatError("invalid Huffman code in scan")
            pos += ln
            rs = e >> 5
            s = rs & 15
            r = rs >> 4
            if s:
                k += r
                if k > se:
                    raise JpegFormatError("AC run past band end")
                v = (w[pos >> 3] >> (32 - (pos & 7) - s)) & _EXT_MASK[s]
                pos += s
                if v < _EXT_HALF[s]:
                    v += 1 - (1 << s)
                ia(bf + k)
                va(v << al)
                k += 1
            elif r == 15:  # ZRL
                k += 16
            else:  # EOBn: run of (1<<r)+ext end-of-band blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += (
                        w[pos >> 3] >> (32 - (pos & 7) - r)
                    ) & _EXT_MASK[r]
                    pos += r
                break
        if pos > total:
            raise JpegFormatError("entropy data exhausted")
    if pos > total:
        raise JpegFormatError("entropy data exhausted")
    if idx:
        coef[np.asarray(idx, np.int64)] = np.asarray(val, np.int32)


def _scan_ac_refine(coef, entry, ux, uy, segs, actab, ri, ss, se, al):
    """Progressive AC refinement (T.81 G.1.2.3): newly significant
    coefficients arrive as (run, 1) symbols whose run counts ZERO-
    HISTORY positions; every already-nonzero coefficient passed over —
    including those inside an EOB run — reads one correction bit.

    The C kernel (when available) runs the textbook per-coefficient
    loop directly against the coefficient store; the batched numpy
    implementation below remains the fallback and the equivalence
    oracle in tests.

    Fully batched: the scan's band matrix, its nonzero/zero position
    indexes and prefix counts are gathered ONCE up front, so each
    Huffman symbol advances by O(1) ordinal arithmetic instead of a
    per-coefficient loop, EOB runs consume whole ordinal ranges, and
    the correction/sign bits — whose stream offsets are known as soon
    as the counts are — are read and applied in one vectorized pass per
    restart segment.  Bit-identical to the per-coefficient reference
    loop (pinned by decode(progressive)==decode(baseline) tests)."""
    if _native.get_lib() is not None and _native.jpeg_scan_ac_refine(
        segs, _huff_lut_np(actab), coef, entry[1], entry[2], entry[3],
        ux, uy, int(ri or 0), ss, se, al,
    ):
        return
    aclut = _huff_lut(actab)
    p1 = 1 << al
    kmax = se - ss
    a, b, c0 = entry[1], entry[2], entry[3]
    n_units = ux * uy
    munits = np.arange(n_units, dtype=np.int64)
    bfs = (munits // ux) * a + (munits % ux) * b + c0 + ss
    if a == ux * b and b == 64:
        # contiguous block raster (the common ns=1 layout): the band
        # matrix is a strided VIEW of the store — no gather copy
        bands = coef[c0:c0 + n_units * 64].reshape(n_units, 64)[:, ss:se + 1]
    else:
        bands = coef[bfs[:, None] + np.arange(kmax + 1)]
    nzmask = bands != 0
    # row-major nonzero ordinals: every correction group below is a
    # contiguous [o1, o2) slice of this order
    nz_rows, nz_cols_all = np.nonzero(nzmask)
    nz_flat = bfs[nz_rows] + nz_cols_all
    nz_vals = bands[nzmask]
    nz_counts = nzmask.sum(1)
    nz_off_l = np.concatenate(([0], np.cumsum(nz_counts))).tolist()
    nz_counts_l = nz_counts.tolist()
    # zero-history positions per row; kept as a numpy array (scalar-
    # indexed per symbol, far cheaper than materializing python lists).
    # No cumulative-nz matrix is needed: the (zi+r)-th zero of a row
    # sits at column zt with exactly zi+r+1 zeros at or before it, so
    # the nz count through zt is zt - zi - r by construction.
    z_cols = np.nonzero(~nzmask)[1]
    z_counts = (kmax + 1) - nz_counts
    z_counts_l = z_counts.tolist()
    z_off_l = np.concatenate(([0], np.cumsum(z_counts))).tolist()

    def flush(si_bytes, go1, go2, gstart, ins_pos, ins_bit):
        """Apply one segment's deferred correction + sign bits."""
        bits_np = np.unpackbits(np.frombuffer(si_bytes, np.uint8))
        if go1:
            o1 = np.asarray(go1, np.int64)
            o2 = np.asarray(go2, np.int64)
            cnts = o2 - o1
            total_c = int(cnts.sum())
            if total_c:
                starts = np.asarray(gstart, np.int64)
                before = np.concatenate(([0], np.cumsum(cnts)[:-1]))
                rel = np.arange(total_c, dtype=np.int64) - np.repeat(
                    before, cnts
                )
                offs = np.repeat(starts, cnts) + rel
                sel = np.repeat(o1, cnts) + rel
                bits = bits_np[offs]
                vals = nz_vals[sel]
                apply = (bits == 1) & ((vals & p1) == 0)
                if apply.any():
                    va = vals[apply]
                    coef[nz_flat[sel[apply]]] = np.where(
                        va > 0, va + p1, va - p1
                    )
        if ins_pos:
            bits = bits_np[np.asarray(ins_bit, np.int64)]
            coef[np.asarray(ins_pos, np.int64)] = np.where(
                bits == 1, p1, -p1
            ).astype(np.int32)

    eobrun = 0
    si = 0
    w, total = _seg_for(segs, 0)
    pos = 0
    go1, go2, gstart = [], [], []
    ins_pos, ins_bit = [], []
    ga1, ga2, gas = go1.append, go2.append, gstart.append
    ia, ib = ins_pos.append, ins_bit.append
    ext_mask = _EXT_MASK
    m = 0
    while m < n_units:
        if ri and m and m % ri == 0:
            flush(segs[si], go1, go2, gstart, ins_pos, ins_bit)
            go1, go2, gstart = [], [], []
            ins_pos, ins_bit = [], []
            ga1, ga2, gas = go1.append, go2.append, gstart.append
            ia, ib = ins_pos.append, ins_bit.append
            si += 1
            w, total = _seg_for(segs, si)
            pos = 0
            eobrun = 0
        if eobrun:
            # whole-run blocks: no symbols, one correction bit per
            # nonzero-history coefficient in flat row-major order
            lim = n_units - m
            if ri:
                lim = min(lim, ri - (m % ri))
            take = min(eobrun, lim)
            cnt = nz_off_l[m + take] - nz_off_l[m]
            if cnt:
                if pos + cnt > total:
                    raise JpegFormatError("entropy data exhausted")
                ga1(nz_off_l[m])
                ga2(nz_off_l[m + take])
                gas(pos)
                pos += cnt
            eobrun -= take
            m += take
            continue
        bf = int(bfs[m])
        row_nz0 = nz_off_l[m]
        row_nz_n = nz_counts_l[m]
        zrow0 = z_off_l[m]
        zrow_n = z_counts_l[m]
        zi = 0
        k = 0
        o1 = 0  # running nz ordinal before k; each advance sets o1 = o2
        while k <= kmax:
            e = aclut[(w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF]
            ln = e & 31
            if ln == 0:
                raise JpegFormatError("invalid Huffman code in scan")
            pos += ln
            rs = e >> 5
            s = rs & 15
            r = rs >> 4
            if s == 0:
                if r != 15:  # EOBn: run length, then this block's tail
                    eobrun = 1 << r
                    if r:
                        eobrun += (
                            w[pos >> 3] >> (32 - (pos & 7) - r)
                        ) & ext_mask[r]
                        pos += r
                    cnt = row_nz_n - o1
                    if cnt:
                        ga1(row_nz0 + o1)
                        ga2(row_nz0 + row_nz_n)
                        gas(pos)
                        pos += cnt
                    eobrun -= 1
                    k = kmax + 1
                    break
                # ZRL: skip 16 zero-history positions (nz through the
                # 16th zero zt = zt - zi - 15, by zero-count identity)
                if zi + 15 < zrow_n:
                    zt = int(z_cols[zrow0 + zi + 15])
                    o2 = zt - zi - 15
                    zi += 16
                    k = zt + 1
                else:  # run exceeds the band: cross remaining nz, stop
                    o2 = row_nz_n
                    zi = zrow_n
                    k = kmax + 1
                cnt = o2 - o1
                if cnt:
                    ga1(row_nz0 + o1)
                    ga2(row_nz0 + o2)
                    gas(pos)
                    pos += cnt
                o1 = o2
            elif s == 1:
                sign_pos = pos  # sign bit precedes the crossed corrections
                pos += 1
                if zi + r < zrow_n:
                    zt = int(z_cols[zrow0 + zi + r])
                    o2 = zt - zi - r
                    zi += r + 1
                    k = zt + 1
                    ia(bf + zt)
                    ib(sign_pos)
                else:  # run past band end: corrections only, no insert
                    o2 = row_nz_n
                    zi = zrow_n
                    k = kmax + 1
                cnt = o2 - o1
                if cnt:
                    ga1(row_nz0 + o1)
                    ga2(row_nz0 + o2)
                    gas(pos)
                    pos += cnt
                o1 = o2
            else:
                raise JpegFormatError("refinement magnitude must be 1")
            if pos > total:
                raise JpegFormatError("entropy data exhausted")
        if pos > total:
            raise JpegFormatError("entropy data exhausted")
        m += 1
    flush(segs[si], go1, go2, gstart, ins_pos, ins_bit)


_T32 = None  # float32 DCT basis, built lazily (module init order)


def _assemble(frame, qt):
    """Coefficient store → pixels: batched dequant + inverse zigzag +
    batched-matmul IDCT per component, chroma upsample, YCbCr→RGB.
    float32 throughout: coefficients are ≤ ~2^15·255 and the IDCT sums
    64 terms, so worst-case error ≈ 1e-3 ≪ the 0.5 rounding step —
    and it halves the memory traffic of the hottest vector stage."""
    global _T32
    if _T32 is None:
        _T32 = _T.astype(np.float32)
    h, w = frame.h, frame.w
    hmax, vmax = frame.hmax, frame.vmax
    planes = []
    for ci, c in enumerate(frame.comps):
        if c["tq"] not in qt:
            raise JpegFormatError(f"missing quant table {c['tq']}")
        # unzigzag FIRST with np.take (the cheapest of the gather
        # shapes), cast, then dequant against the natural-order table:
        # multiplying int32 coefficients by a float32 q silently
        # promotes to float64 and doubles the traffic of this stage
        q = qt[c["tq"]].reshape(-1).astype(np.float32)
        ny, nx = c["rows"], c["cols"]
        deq = (
            np.take(frame.coef[ci].reshape(-1, 64), UNZIGZAG, axis=1)
            .astype(np.float32)
            * q
        )
        # IDCT = T^T F T as two flat GEMMs: one (8N, 8) x (8, 8)
        # product per side beats the (N, 8, 8) batched-matmul path ~3x
        # (the batch loop overhead dwarfs the 8x8 flops); each
        # transpose copy is contiguous and cheap next to that
        tmp = (
            np.ascontiguousarray(deq.reshape(-1, 8, 8).transpose(0, 2, 1))
            .reshape(-1, 8)
            @ _T32
        )  # rows of B^T T
        pix = (
            np.ascontiguousarray(tmp.reshape(-1, 8, 8).transpose(0, 2, 1))
            .reshape(-1, 8)
            @ _T32
        ).reshape(-1, 8, 8)  # (T^T B) T
        pix += np.float32(128.0)
        plane = (
            pix.reshape(ny, nx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ny * 8, nx * 8)
        )
        # upsample to full MCU-grid resolution by sample replication
        plane = np.repeat(
            np.repeat(plane, hmax // c["h"], axis=1), vmax // c["v"], axis=0
        )
        planes.append(plane[: h, : w])
    # channel-major staging buffer: every arithmetic op runs over
    # contiguous planes; the single strided pass is the final uint8
    # cast (np.stack into (h,w,3) float32 would pay the interleave on
    # 4-byte lanes AND an extra copy)
    arr = np.empty((len(planes), h, w), np.float32)
    if len(planes) == 3:  # JFIF YCbCr → RGB (BT.601, full range)
        y, cb, cr = planes
        cb = cb - np.float32(128.0)
        cr = cr - np.float32(128.0)
        np.multiply(cr, np.float32(1.402), out=arr[0])
        arr[0] += y
        np.multiply(cb, np.float32(-0.344136), out=arr[1])
        arr[1] -= np.float32(0.714136) * cr
        arr[1] += y
        np.multiply(cb, np.float32(1.772), out=arr[2])
        arr[2] += y
    else:
        for i, p in enumerate(planes):
            arr[i] = p
    np.rint(arr, out=arr)
    np.clip(arr, 0, 255, out=arr)
    return arr.transpose(1, 2, 0).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixtures + sinks)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for k in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.buf <<= 8 - self.nbits  # pad with 0s (1s also legal)
            self.out.append(self.buf)
            if self.buf == 0xFF:
                self.out.append(0x00)
            self.buf = 0
            self.nbits = 0


def _huff_codes(bits, values):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int):
    """signed value → (category t, t-bit code)"""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_blocks(bw, blocks_zz, dc_codes, ac_codes, pred):
    for blk in blocks_zz:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        t, code = _magnitude(diff)
        bw.write(*dc_codes[t])
        if t:
            bw.write(code, t)
        run = 0
        nz = np.flatnonzero(blk[1:]) + 1
        last = nz[-1] if nz.size else 0
        k = 1
        while k <= last:
            v = int(blk[k])
            if v == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                bw.write(*ac_codes[0xF0])  # ZRL
                run -= 16
            t, code = _magnitude(v)
            bw.write(*ac_codes[(run << 4) | t])
            bw.write(code, t)
            run = 0
            k += 1
        if last < 63:
            bw.write(*ac_codes[0x00])  # EOB
    return pred


def _plane_blocks_zz(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Padded component plane → (n_blocks, 64) quantized zigzag ints,
    block raster order."""
    hh, ww = plane.shape
    blocks = (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeffs = fdct_blocks(blocks)
    qd = np.round(coeffs / q.reshape(8, 8)).astype(np.int32)
    return qd.reshape(-1, 64)[:, ZIGZAG]


def _pad(plane: np.ndarray, my: int, mx: int) -> np.ndarray:
    """Edge-replicate to (my, mx)."""
    hh, ww = plane.shape
    return np.pad(plane, ((0, my - hh), (0, mx - ww)), mode="edge")


def encode(
    img: np.ndarray, subsampling: str = "444", restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 → JPEG
    bytes. ``subsampling``: '444', '422' or '420' (ignored for
    grayscale); ``restart_interval`` > 0 emits DRI and RSTn markers
    every that many MCUs (crawl JPEGs commonly carry them — exercises
    the decoder's segment-reset path); ``progressive`` writes an SOF2
    stream (spectral selection + successive approximation, the
    dominant real-crawl JPEG variant) with per-scan frequency-
    optimized Huffman tables (T.81 Annex K.2) — the quantized
    coefficients are identical to the baseline encoding, so decode
    output is bit-identical between the two modes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise JpegFormatError(f"cannot encode {img.shape[2]}-channel image")
    if subsampling not in ("444", "422", "420"):
        raise JpegFormatError(f"unsupported subsampling {subsampling!r}")
    if progressive and restart_interval:
        raise JpegFormatError(
            "restart intervals unsupported in progressive encode"
        )
    h, w = img.shape[:2]

    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker, body):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body)

    # DQT (zigzag order on the wire)
    segment(0xDB, bytes([0x00]) + bytes(STD_LUMA_Q[ZIGZAG].astype(np.uint8)))
    if not gray:
        segment(0xDB, bytes([0x01]) + bytes(STD_CHROMA_Q[ZIGZAG].astype(np.uint8)))

    # luma sampling factors per mode: 444 → 1x1, 422 → 2x1, 420 → 2x2
    sh = 2 if (not gray and subsampling in ("422", "420")) else 1
    sv = 2 if (not gray and subsampling == "420") else 1
    # SOF0 (baseline) / SOF2 (progressive)
    if gray:
        comps = [(1, 0x11, 0)]
    else:
        comps = [(1, (sh << 4) | sv, 0), (2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    segment(0xC2 if progressive else 0xC0, sof)

    # component planes
    if gray:
        planes = [(img.astype(np.float64), STD_LUMA_Q, 1, 1)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sh == 2 or sv == 2:
            # average sh×sv neighborhoods → subsampled chroma
            my = -(-h // (8 * sv)) * 8 * sv
            mx = -(-w // (8 * sh)) * 8 * sh
            cbp = _pad(cb, my, mx)
            crp = _pad(cr, my, mx)
            cb = cbp.reshape(my // sv, sv, mx // sh, sh).mean(axis=(1, 3))
            cr = crp.reshape(my // sv, sv, mx // sh, sh).mean(axis=(1, 3))
        planes = [(y, STD_LUMA_Q, sh, sv), (cb, STD_CHROMA_Q, 1, 1),
                  (cr, STD_CHROMA_Q, 1, 1)]

    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, q, ch, cv in planes:
        my, mx = mcus_y * cv * 8, mcus_x * ch * 8
        zz = _plane_blocks_zz(_pad(plane, my, mx), q)
        comp_blocks.append(zz.reshape(mcus_y * cv, mcus_x * ch, 64))

    if progressive:
        factors = [(p[2], p[3]) for p in planes]
        _encode_progressive(
            segment, out.extend, comp_blocks, factors, gray, h, w,
            mcus_x, mcus_y, hmax, vmax,
        )
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    # DHT
    for tc_th, (bits, vals) in (
        ((0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)) if gray else
        ((0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA),
         (0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA))
    ):
        segment(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))

    # SOS header
    if gray:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    segment(0xDA, sos)

    dc_l, ac_l = _huff_codes(*STD_DC_LUMA), _huff_codes(*STD_AC_LUMA)
    dc_c, ac_c = _huff_codes(*STD_DC_CHROMA), _huff_codes(*STD_AC_CHROMA)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    bw = _BitWriter()
    pred = [0] * len(planes)
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out.extend(
                bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            )
            pred = [0] * len(planes)
        myi, mxi = divmod(m, mcus_x)
        for ci, (plane, q, ch, cv) in enumerate(planes):
            blks = [
                comp_blocks[ci][myi * cv + by, mxi * ch + bx]
                for by in range(cv)
                for bx in range(ch)
            ]
            pred[ci] = _encode_blocks(bw, blks, *tables[ci], pred[ci])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G encode side)
# ---------------------------------------------------------------------------


def _build_huff_table(freq: dict[int, int]):
    """Symbol frequencies → canonical (BITS[1..16], HUFFVAL) via the
    T.81 Annex K.2 algorithm (Figures K.1-K.3): pairwise lowest-
    frequency merging with the reserved 256 pseudo-symbol, 16-bit
    length limiting, size-then-value ordering."""
    freqs = [0] * 257
    for s, f in freq.items():
        freqs[s] = f
    freqs[256] = 1  # reserved: keeps the all-ones code unassigned
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        v1 = v2 = -1
        for i in range(257):
            f = freqs[i]
            if f > 0:
                if v1 == -1 or f < freqs[v1] or (f == freqs[v1] and i > v1):
                    v2 = v1
                    v1 = i
                elif v2 == -1 or f < freqs[v2] or (f == freqs[v2] and i > v2):
                    v2 = i
        if v2 == -1:
            break
        freqs[v1] += freqs[v2]
        freqs[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # adjust_bits: fold codes longer than 16
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's code point
    huffval = [
        v for v in sorted(range(256), key=lambda x: (codesize[x], x))
        if codesize[v]
    ]
    return bits[1:17], huffval


class _ScanEmitter:
    """Ordered (symbol | raw-bit) emission buffer for one scan: pass 1
    collects symbol frequencies, then the scan serializes with tables
    built from exactly those frequencies."""

    def __init__(self):
        self.items = []
        self.freq: dict[tuple[int, int], int] = {}

    def sym(self, tid, s):
        self.items.append((0, tid, s))
        k = (tid, s)
        self.freq[k] = self.freq.get(k, 0) + 1

    def bits(self, val, n):
        if n:
            self.items.append((1, val, n))

    def bit(self, b):
        self.items.append((1, b, 1))


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.2): divide by 2^Al truncating
    TOWARD ZERO (DC uses plain arithmetic shift instead)."""
    return -((-v) >> al) if v < 0 else v >> al


def _comp_true_dims(w, h, ch, cv, hmax, vmax):
    """Non-interleaved block raster dims for a component (T.81 A.2.2)."""
    cw = -(-(w * ch) // hmax)
    chh = -(-(h * cv) // vmax)
    return -(-cw // 8), -(-chh // 8)


def _emit_dc_first(em, comp_blocks, scomps, factors, mcus_x, mcus_y,
                   gray, w, h, hmax, vmax, al):
    """First DC scan (Ah=0): DPCM of the arithmetic-shifted DC values,
    interleaved MCU order for ns>1, block raster for ns=1."""
    preds = [0] * len(scomps)
    if len(scomps) == 1:
        ci = scomps[0]
        ch, cv = factors[ci]
        bx, by = _comp_true_dims(w, h, ch, cv, hmax, vmax)
        tid = 0 if ci == 0 else 1
        for yy in range(by):
            for xx in range(bx):
                dc = int(comp_blocks[ci][yy, xx, 0]) >> al
                diff = dc - preds[0]
                preds[0] = dc
                t, code = _magnitude(diff)
                em.sym(tid, t)
                em.bits(code, t)
        return
    for m in range(mcus_x * mcus_y):
        myi, mxi = divmod(m, mcus_x)
        for si, ci in enumerate(scomps):
            ch, cv = factors[ci]
            tid = 0 if ci == 0 else 1
            for by in range(cv):
                for bx in range(ch):
                    dc = int(
                        comp_blocks[ci][myi * cv + by, mxi * ch + bx, 0]
                    ) >> al
                    diff = dc - preds[si]
                    preds[si] = dc
                    t, code = _magnitude(diff)
                    em.sym(tid, t)
                    em.bits(code, t)


def _emit_dc_refine(em, comp_blocks, scomps, factors, mcus_x, mcus_y,
                    gray, w, h, hmax, vmax, al):
    """DC refinement: one raw bit per block, (dc >> Al) & 1."""
    if len(scomps) == 1:
        ci = scomps[0]
        ch, cv = factors[ci]
        bx, by = _comp_true_dims(w, h, ch, cv, hmax, vmax)
        for yy in range(by):
            for xx in range(bx):
                em.bit((int(comp_blocks[ci][yy, xx, 0]) >> al) & 1)
        return
    for m in range(mcus_x * mcus_y):
        myi, mxi = divmod(m, mcus_x)
        for ci in scomps:
            ch, cv = factors[ci]
            for by in range(cv):
                for bx in range(ch):
                    em.bit((
                        int(comp_blocks[ci][myi * cv + by, mxi * ch + bx, 0])
                        >> al
                    ) & 1)


def _flush_eobn(em, tid, eobrun, corr_bits):
    """Emit an EOBn symbol for a pending end-of-band run plus the
    buffered correction bits of the blocks it covers."""
    r = eobrun.bit_length() - 1
    em.sym(tid, r << 4)
    em.bits(eobrun - (1 << r), r)
    for b in corr_bits:
        em.bit(b)


def _emit_ac_first(em, blocks, tid, ss, se, al):
    """First AC scan for one band (Ah=0): sequential run-length coding
    plus EOBn run accumulation across blocks."""
    eobrun = 0
    for blk in blocks:
        band = [_trunc_shift(int(blk[k]), al) for k in range(ss, se + 1)]
        last = -1
        for i2 in range(len(band) - 1, -1, -1):
            if band[i2]:
                last = i2
                break
        if last == -1:
            eobrun += 1
            if eobrun == 0x7FFF:
                _flush_eobn(em, tid, eobrun, ())
                eobrun = 0
            continue
        if eobrun:
            _flush_eobn(em, tid, eobrun, ())
            eobrun = 0
        run = 0
        for i2 in range(last + 1):
            v = band[i2]
            if v == 0:
                run += 1
                continue
            while run > 15:
                em.sym(tid, 0xF0)  # ZRL
                run -= 16
            t, code = _magnitude(v)
            em.sym(tid, (run << 4) | t)
            em.bits(code, t)
            run = 0
        if last < len(band) - 1:
            eobrun = 1
    if eobrun:
        _flush_eobn(em, tid, eobrun, ())


def _emit_ac_refine(em, blocks, tid, ss, se, al):
    """AC refinement scan (Ah=Al+1): newly significant coefficients as
    (zero-history-run, 1) symbols + sign bit, correction bits for every
    passed-over already-nonzero coefficient, EOBn runs carrying the
    trailing correction bits of the blocks they cover (wire order
    matches the decoder's read order in _scan_ac_refine)."""
    eobrun = 0
    eob_bits: list[int] = []
    for blk in blocks:
        band = [_trunc_shift(int(blk[k]), al) for k in range(ss, se + 1)]
        last_new = -1
        for i2 in range(len(band) - 1, -1, -1):
            if band[i2] in (1, -1):
                last_new = i2
                break
        if last_new == -1:
            # whole block rides the EOB run; its nonzero-history
            # coefficients still contribute correction bits
            eobrun += 1
            eob_bits.extend(abs(v) & 1 for v in band if abs(v) > 1)
            if eobrun == 0x7FFF:
                _flush_eobn(em, tid, eobrun, eob_bits)
                eobrun = 0
                eob_bits = []
            continue
        if eobrun:
            _flush_eobn(em, tid, eobrun, eob_bits)
            eobrun = 0
            eob_bits = []
        run = 0
        pend: list[int] = []
        for i2 in range(last_new + 1):
            v = band[i2]
            av = abs(v)
            if av > 1:  # history-nonzero: correction bit
                pend.append(av & 1)
            elif av == 1:  # newly significant
                em.sym(tid, (run << 4) | 1)
                em.bit(1 if v > 0 else 0)
                for b in pend:
                    em.bit(b)
                pend = []
                run = 0
            else:
                run += 1
                if run == 16:  # ZRL covers exactly 16 zero-history slots
                    em.sym(tid, 0xF0)
                    for b in pend:
                        em.bit(b)
                    pend = []
                    run = 0
        tail = band[last_new + 1:]
        if tail:
            eobrun = 1
            eob_bits = [abs(v) & 1 for v in tail if abs(v) > 1]
    if eobrun:
        _flush_eobn(em, tid, eobrun, eob_bits)


def _write_scan(segment, raw, em, scan_hdr_comps, ss, se, ah, al, tc):
    """DHT segments (frequency-built tables) + SOS header + serialized
    entropy bytes for one scan."""
    tids = sorted({t for (t, _s) in em.freq})
    codes = {}
    for tid in tids:
        f = {s: c for (t, s), c in em.freq.items() if t == tid}
        bits, vals = _build_huff_table(f)
        codes[tid] = _huff_codes(bits, vals)
        segment(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([len(scan_hdr_comps)])
    for cid, td, ta in scan_hdr_comps:
        sos += bytes([cid, (td << 4) | ta])
    sos += bytes([ss, se, (ah << 4) | al])
    segment(0xDA, sos)
    bw = _BitWriter()
    for it in em.items:
        if it[0] == 0:
            bw.write(*codes[it[1]][it[2]])
        else:
            bw.write(it[1], it[2])
    bw.flush()
    raw(bw.out)


def _encode_progressive(segment, raw, comp_blocks, factors, gray, h, w,
                        mcus_x, mcus_y, hmax, vmax):
    """Write the scan script: DC first (Al=1) + DC refinement, per-
    component spectral-selection AC scans with successive approximation
    on luma, then AC refinements down to Al=0. Every decoder path —
    interleaved DC, non-interleaved bands, EOBn runs, ZRL-in-refine,
    multi-level approximation — is exercised."""
    ncomp = len(comp_blocks)
    all_comps = list(range(ncomp))

    def comp_ac_blocks(ci):
        ch, cv = factors[ci]
        bx, by = _comp_true_dims(w, h, ch, cv, hmax, vmax)
        return [comp_blocks[ci][yy, xx] for yy in range(by)
                for xx in range(bx)]

    def dc_hdr(ci, ta=0):
        return (ci + 1, 0 if ci == 0 else 1, ta)

    # 1. DC first, Al=1, interleaved
    em = _ScanEmitter()
    _emit_dc_first(em, comp_blocks, all_comps, factors, mcus_x, mcus_y,
                   gray, w, h, hmax, vmax, 1)
    _write_scan(segment, raw, em,
                [dc_hdr(ci) for ci in all_comps], 0, 0, 0, 1, 0)
    # 2. AC scans (first pass)
    ac_scans = [(0, 1, 5, 0, 2), (0, 6, 63, 0, 2)] if gray else [
        (0, 1, 5, 0, 2),        # luma low band, coarse
        (1, 1, 63, 0, 1),       # chroma full band
        (2, 1, 63, 0, 1),
        (0, 6, 63, 0, 2),       # luma high band, coarse
    ]
    for ci, ss, se, ah, al in ac_scans:
        em = _ScanEmitter()
        _emit_ac_first(em, comp_ac_blocks(ci), 0, ss, se, al)
        _write_scan(segment, raw, em, [(ci + 1, 0, 0)], ss, se, ah, al, 1)
    # 3. DC refinement, Al=0
    em = _ScanEmitter()
    _emit_dc_refine(em, comp_blocks, all_comps, factors, mcus_x, mcus_y,
                    gray, w, h, hmax, vmax, 0)
    _write_scan(segment, raw, em,
                [dc_hdr(ci) for ci in all_comps], 0, 0, 1, 0, 0)
    # 4. AC refinements
    ref_scans = [(0, 1, 63, 2, 1), (0, 1, 63, 1, 0)] if gray else [
        (0, 1, 63, 2, 1),       # luma 2 -> 1
        (1, 1, 63, 1, 0),       # chroma 1 -> 0
        (2, 1, 63, 1, 0),
        (0, 1, 63, 1, 0),       # luma 1 -> 0
    ]
    for ci, ss, se, ah, al in ref_scans:
        em = _ScanEmitter()
        _emit_ac_refine(em, comp_ac_blocks(ci), 0, ss, se, al)
        _write_scan(segment, raw, em, [(ci + 1, 0, 0)], ss, se, ah, al, 1)
