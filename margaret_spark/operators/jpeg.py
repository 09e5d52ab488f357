"""Baseline JPEG (ITU-T T.81) codec, stdlib + numpy only.

Decoder: full baseline path — marker walk, DQT/DHT/SOF0/SOS/DRI
parse, canonical Huffman decode (any valid table read from DHT),
DC prediction, dequantize, 2-D IDCT, nearest-neighbor chroma
upsampling for sampling factors in {1, 2}, YCbCr→RGB. Progressive
(SOF2), arithmetic coding, and 12-bit precision are rejected with a
clear error.

Encoder: baseline — single-component grayscale, 4:4:4, or 4:2:0
(``subsample=True``: chroma 2×2-averaged, Y sampling factor 2×2) —
quality-scaled Annex-K quantization tables, and
*self-describing* canonical Huffman tables: instead of transcribing
the long Annex-K code tables, the encoder builds fixed-length
canonical tables over the symbols it can emit and writes them to DHT
— any conforming decoder (including this module's) reads code tables
from DHT, so the stream is standard baseline JPEG, just with a
non-default (less compact) entropy code.

Entropy coding is LOSSLESS over the quantized coefficients: tests
assert decode recovers the encoder's quantized blocks bit-exactly,
which pins the Huffman/bitstream layer independently of the lossy
DCT/quantization layer (checked separately via PSNR bounds). The
FDCT (encoder) and IDCT (decoder) are derived independently — a
DCT-II basis matrix vs a separable inverse-transform basis — so a
sign/scale bug in one cannot cancel in round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1/K.2 base quantization tables (row-major, natural order)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zig-zag order: ZIGZAG[k] = (row, col) of the k-th coefficient
_Z = []
for s in range(15):
    ks = range(0, s + 1)
    diag = [(i, s - i) for i in ks if i < 8 and s - i < 8]
    _Z.extend(diag if s % 2 == 1 else diag[::-1])
ZIGZAG = _Z
ZROWS = np.array([r for r, _ in ZIGZAG])
ZCOLS = np.array([c for _, c in ZIGZAG])


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → base tables, 100 → all-ones."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * s + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int32)


# DCT-II basis (encoder): A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
def _fdct_basis() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


# inverse basis (decoder), derived independently from the IDCT sum
# f(x,y) = ¼ ΣΣ c(u)c(v) F(u,v) cos(...)cos(...):
# B[x, u] = ½·c(u)·cos((2x+1)uπ/16); f = B @ F @ B.T
def _idct_basis() -> np.ndarray:
    b = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
            b[x, u] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return b


_FDCT = _fdct_basis()
_IDCT = _idct_basis()


def fdct2(block: np.ndarray) -> np.ndarray:
    return _FDCT @ block @ _FDCT.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _IDCT @ coef @ _IDCT.T


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


class _HuffDecoder:
    """Canonical Huffman decode table from DHT's (BITS, HUFFVAL)."""

    def __init__(self, bits: list[int], huffval: list[int]):
        # code boundaries per length (T.81 C.2)
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += n
                self.max_code[ln] = code - 1
                k += n
            code <<= 1
        self.huffval = huffval

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                return self.huffval[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("jpeg: invalid Huffman code")


def _fixed_table(symbols: list[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """A valid canonical JPEG Huffman table giving every symbol the
    same code length L with 2^L > len(symbols) (so the all-ones code
    stays unused, as T.81 requires). Returns (BITS, HUFFVAL,
    {symbol: (code, length)}) — simple, conforming, self-describing."""
    n = len(symbols)
    ln = 1
    while (1 << ln) <= n:
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = n
    enc = {s: (i, ln) for i, s in enumerate(symbols)}
    return bits, list(symbols), enc


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn
    awareness (restart markers reset the reader between intervals)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0

    def read_bit(self) -> int:
        if self.bit == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    # marker (EOI/RST...) — pad with 1s per T.81
                    self.cur = 0xFF
                    self.bit = 8
                    return self.read_bit()
            else:
                self.pos += 1
            self.cur = b
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int:
        """Skip to the next marker (for RST handling); returns it."""
        self.bit = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        marker = self.data[self.pos + 1]
        self.pos += 2
        return marker


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # drop the drained bits: an unbounded accumulator turns every
        # later shift into a bignum op and the encoder quadratic in
        # image size (measured 4× pixels → 12.5× time before this)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per T.81
        return bytes(self.out)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _block_encode(
    plane: np.ndarray, qt: np.ndarray
) -> tuple[list[np.ndarray], int, int]:
    """Quantized 8×8 blocks of a (padded) component plane, row-major
    block order, plus the block grid dims."""
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = fdct2(blk)
            q = np.round(coef / qt).astype(np.int32)
            blocks.append(q)
    return blocks, bh, bw


def encode_jpeg(
    pixels: np.ndarray | bytes,
    width: int | None = None,
    height: int | None = None,
    channels: int | None = None,
    quality: int = 90,
    subsample: bool = False,
) -> bytes:
    """Baseline JPEG bytes for an 8-bit image. ``pixels`` is an
    (H, W) grayscale or (H, W, 3) RGB uint8 array (or the equivalent
    flat bytes with dims given). ``subsample=True`` emits 4:2:0
    (chroma averaged 2×2, Y sampling factor 2×2 — the layout real
    photo JPEGs use); default is 4:4:4."""
    if isinstance(pixels, (bytes, bytearray)):
        if None in (width, height, channels):
            raise ValueError("flat pixel bytes need width/height/channels")
        arr = np.frombuffer(bytes(pixels), dtype=np.uint8)
        arr = arr.reshape((height, width) if channels == 1 else (height, width, channels))
    else:
        arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)

    # components: (plane, qt, qt_id, h_samp, v_samp)
    if gray:
        comps_spec = [(arr.astype(np.float64), qt_l, 0, 1, 1)]
    else:
        ycc = _rgb_to_ycbcr(arr.astype(np.float64))
        if subsample:
            # 4:2:0 — chroma is the 2×2 mean of the (edge-padded-to-
            # even) full-res plane; Y carries sampling factor 2×2
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cb = np.pad(ycc[..., 1], ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(ycc[..., 2], ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            comps_spec = [
                (ycc[..., 0], qt_l, 0, 2, 2),
                (cb, qt_c, 1, 1, 1),
                (cr, qt_c, 1, 1, 1),
            ]
        else:
            comps_spec = [
                (ycc[..., 0], qt_l, 0, 1, 1),
                (ycc[..., 1], qt_c, 1, 1, 1),
                (ycc[..., 2], qt_c, 1, 1, 1),
            ]
    hmax = max(c[3] for c in comps_spec)
    vmax = max(c[4] for c in comps_spec)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # pad every plane to its full MCU-grid extent and pre-quantize all
    # blocks in raster order per component
    comp_blocks: list[dict] = []
    for plane, qt, qt_id, hs, vs in comps_spec:
        gh, gw = mcuy * 8 * vs, mcux * 8 * hs
        padded = np.pad(
            plane,
            ((0, gh - plane.shape[0]), (0, gw - plane.shape[1])),
            mode="edge",
        )
        grid = {}
        for by in range(gh // 8):
            for bx in range(gw // 8):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                grid[(by, bx)] = np.round(fdct2(blk) / qt).astype(np.int32)
        comp_blocks.append(
            {"grid": grid, "qt_id": qt_id, "h": hs, "v": vs}
        )

    # A single interleaved scan encodes blocks in MCU order: at each
    # MCU position, each component contributes its h×v raster of
    # blocks — NOT all of one component then the next (a planar layout
    # silently shifts every later component's blocks and wrecks
    # chroma).
    order = [
        (ci, (my * c["v"] + by, mx * c["h"] + bx))
        for my in range(mcuy)
        for mx in range(mcux)
        for ci, c in enumerate(comp_blocks)
        for by in range(c["v"])
        for bx in range(c["h"])
    ]

    def _walk(emit_dc, emit_ac, emit_bits):
        preds = [0] * len(comp_blocks)
        for ci, key in order:
            q = comp_blocks[ci]["grid"][key]
            zz = q[ZROWS, ZCOLS]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            sz = _size_of(diff)
            emit_dc(sz)
            if sz:
                emit_bits(diff if diff >= 0 else diff + (1 << sz) - 1, sz)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    if run == 16:
                        emit_ac(0xF0)
                        run = 0
                else:
                    s = _size_of(v)
                    emit_ac((run << 4) | s)
                    emit_bits(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
            if last < 63:
                emit_ac(0x00)

    # pass 1: gather emitted symbols → fixed-length canonical tables
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    _walk(dc_syms.add, ac_syms.add, lambda v, s: None)
    dc_bits, dc_vals, dc_enc = _fixed_table(sorted(dc_syms))
    ac_bits, ac_vals, ac_enc = _fixed_table(sorted(ac_syms))

    # pass 2: emit the bitstream
    bw_ = _BitWriter()
    _walk(
        lambda s: bw_.write(dc_enc[s][0], dc_enc[s][1]),
        lambda s: bw_.write(ac_enc[s][0], ac_enc[s][1]),
        bw_.write,
    )
    entropy = bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid, qt):
        zz = qt[ZROWS, ZCOLS].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += dqt(0, qt_l)
    if not gray:
        out += dqt(1, qt_c)

    ncomp = len(comp_blocks)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci, c in enumerate(comp_blocks):
        sof += bytes([ci + 1, (c["h"] << 4) | c["v"], c["qt_id"]])
    out += b"\xff\xc0" + sof

    def dht(cls, tid, bits, vals):
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, dc_bits, dc_vals) + dht(1, 0, ac_bits, ac_vals)

    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0 for all
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos + entropy + b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def jpeg_meta(blob: bytes):
    """(width, height, n_components) from SOF0/SOF1, or None if not a
    JPEG (no SOI) — raises nothing on truncated input, returns None."""
    b = bytes(blob or b"")
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xFF:  # T.81 allows 0xFF fill bytes before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            return None
        (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        # dimensions parse identically from EVERY SOFn frame header —
        # including progressive/lossless frames the DECODER rejects:
        # metadata extraction over a dirty corpus should still
        # classify them (SOF0-15 except DHT C4 / JPG C8 / DAC CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 10 > n:  # truncated SOF: not a parseable JPEG
                return None
            _prec, hh, ww, nc = struct.unpack(">BHHB", b[pos + 4 : pos + 10])
            return ww, hh, nc
        if marker == 0xD9:
            return None
        pos += 2 + ln
    return None


def _parse_stream(b: bytes) -> dict:
    """Shared marker walk up to (and including) SOS: quant tables,
    Huffman tables, frame/components, restart interval, scan mapping,
    and the entropy-data offset. Both the pixel decoder and the
    coefficient extractor consume this — ONE parser, no drift."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: no SOI")
    pos = 2
    st: dict = {
        "qts": {},
        "huff_dc": {},
        "huff_ac": {},
        "comps": None,
        "size": None,
        "restart_interval": 0,
    }
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xFF:  # 0xFF fill bytes before a marker (T.81)
            pos += 1
            continue
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", b[pos : pos + 2])
        seg = b[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qt = np.zeros((8, 8), dtype=np.int32)
                qt[ZROWS, ZCOLS] = vals
                st["qts"][tid] = qt
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                cnt = sum(bits)
                vals = list(seg[p : p + cnt])
                p += cnt
                table = _HuffDecoder(bits, vals)
                (st["huff_dc"] if cls == 0 else st["huff_ac"])[tid] = table
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, hh, ww, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, qtid = seg[6 + 3 * ci : 9 + 3 * ci]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise ValueError("jpeg: sampling factors beyond 2 unsupported")
                comps.append({"id": cid, "h": hs, "v": vs, "qt": qtid})
            st["comps"] = comps
            st["size"] = (ww, hh)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline (SOF0/SOF1) supported")
        elif marker == 0xDD:  # DRI
            (st["restart_interval"],) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if st["comps"] is None:
                # SOS before SOF must fail as a ValueError, not escape
                # as a TypeError from the MCU walk's None deref
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = {}
            for si in range(ns):
                cid, tabs = seg[1 + 2 * si], seg[2 + 2 * si]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
            st["scan"] = scan
            st["entropy_pos"] = pos + ln
            return st
        elif marker == 0xD9:
            break
        pos += ln
    raise ValueError("jpeg: no scan data")


def _walk_mcus(b: bytes, st: dict, on_block) -> None:
    """Shared entropy walk: Huffman-decode every block in MCU order
    (restart-interval aware) and hand (component index, zigzag int32
    coefficient vector) to ``on_block``."""
    comps = st["comps"]
    ww, hh = st["size"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (ww + 8 * hmax - 1) // (8 * hmax)
    mcuy = (hh + 8 * vmax - 1) // (8 * vmax)
    br = _BitReader(b, st["entropy_pos"])
    preds = [0] * len(comps)
    restart_interval = st["restart_interval"]
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                marker = br.align_to_marker()
                if not (0xD0 <= marker <= 0xD7):
                    raise ValueError("jpeg: expected RST marker")
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = st["scan"][c["id"]]
                hd, ha = st["huff_dc"][dct], st["huff_ac"][act]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = hd.decode(br)
                        preds[ci] += _extend(br.read_bits(t), t)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = ha.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        on_block(ci, c, my, mx, by, bx, zz)
            mcu_count += 1


def decode_jpeg(blob: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, samples): full baseline decode.
    Grayscale stays 1-channel; 3-component YCbCr converts to
    interleaved RGB. Raises ValueError on non-baseline, truncated, or
    corrupt streams (never struct.error/IndexError — a dirty corpus
    must fail classification, not crash the task)."""
    b = bytes(blob)
    try:
        return _decode_jpeg_inner(b)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"jpeg: truncated or corrupt stream: {e!r}") from e


def _decode_jpeg_inner(b: bytes) -> tuple[int, int, int, bytes]:
    st = _parse_stream(b)
    comps = st["comps"]
    ww, hh = st["size"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (ww + 8 * hmax - 1) // (8 * hmax)
    mcuy = (hh + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]

    def on_block(ci, c, my, mx, by, bx, zz):
        qt = st["qts"][c["qt"]]
        coef = np.zeros((8, 8), dtype=np.float64)
        coef[ZROWS, ZCOLS] = zz * qt[ZROWS, ZCOLS]
        blk = idct2(coef) + 128.0
        y0 = (my * c["v"] + by) * 8
        x0 = (mx * c["h"] + bx) * 8
        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk

    _walk_mcus(b, st, on_block)
    # upsample to full resolution (nearest) and crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:hh, :ww])
    if len(comps) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return ww, hh, 1, out.tobytes()
    rgb = _ycbcr_to_rgb(full[0], full[1], full[2])
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return ww, hh, 3, out.tobytes()

def decode_jpeg_coefficients(blob: bytes) -> list[np.ndarray]:
    """The quantized coefficient blocks of the FIRST component, in
    MCU/block order — the lossless layer's output, used by tests to
    pin the entropy coder bit-exactly against the encoder. Shares the
    marker and entropy walks with :func:`decode_jpeg` (one parser, no
    drift)."""
    b = bytes(blob)
    blocks: list[np.ndarray] = []

    def on_block(ci, c, my, mx, by, bx, zz):
        if ci == 0:
            q = np.zeros((8, 8), dtype=np.int32)
            q[ZROWS, ZCOLS] = zz
            blocks.append(q)

    try:
        st = _parse_stream(b)
        # the entropy walk must be inside the guard too: a corrupt
        # entropy segment raises IndexError from the bit reader, and
        # the contract (like decode_jpeg's) is ValueError, never a
        # leaked internal
        _walk_mcus(b, st, on_block)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"jpeg: truncated or corrupt stream: {e!r}") from e
    return blocks
