"""Pure-Python/numpy baseline JPEG codec (ITU-T T.81, public spec).

Fills the one multimodal format gap the round-3 review named: the env
has no codec libraries, so JPEG support is implemented from the public
standard directly — no external dependency, same posture as the PNG
(zlib + filter reconstruction) and WAV (stdlib) codecs in
``stages/multimodal.py``.

Scope (baseline DCT, Huffman, 8-bit):

- ``decode_jpeg``: SOF0 baseline sequential, grayscale or YCbCr, ANY
  sampling factors h,v in {1,2,4} (4:4:4, 4:2:2, 4:2:0, ...), Huffman
  tables read from the stream's DHT segments (so libjpeg-produced
  baseline files decode too), restart markers (DRI/RSTn) honored.
  Progressive (SOF2) and arithmetic coding raise NotImplementedError.
- ``encode_jpeg``: quality-scaled Annex-K quantization tables,
  4:4:4 or 4:2:0 chroma subsampling, grayscale passthrough. Huffman
  tables are fixed-width canonical codes built here (12 DC symbols at
  4 bits, the 162 valid AC symbols at 9 bits) — valid per the spec
  (DHT is self-describing; the all-ones codeword is never assigned),
  chosen for simplicity over compression ratio: the engine's JPEG
  payloads exist to exercise the decode/feature/dedup plumbing, not to
  archive.

The DCT pair is the orthonormal 8x8 DCT-II in float64, vectorized over
all blocks of a component with one einsum per direction; the per-block
Python is confined to entropy coding (fixture-scale payloads, decoded
inside actor pools — the same batch-size-bounded posture as the PNG
path, multimodal.py module docstring).

No reference counterpart (the reference is a raster-correction QGIS
plugin with no image codecs); this extends the multimodal component of
the task brief's training-data operator list.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position -> raster index within an 8x8 block (T.81 figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K base quantization tables (luminance / chrominance)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUM, QUANT_CHROM):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: F = C @ block @ C.T."""
    n = np.arange(8)
    k = n[:, None]
    c = np.cos((2 * n[None, :] + 1) * k * np.pi / 16)
    c *= np.sqrt(2 / 8)
    c[0] *= np.sqrt(0.5)
    return c


_C = _dct_matrix()

# --- fixed canonical Huffman tables for the ENCODER (self-describing
# via DHT; see module docstring). DC: SSSS 0..11, all 4-bit codes.
# AC: EOB, ZRL and every RRRRSSSS with SSSS 1..10 — the 162 symbols a
# baseline encoder can emit — all 9-bit codes.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = sorted([0x00, 0xF0] + [(r << 4) | s
                                     for r in range(16)
                                     for s in range(1, 11)])
_DC_BITS = [0] * 17
_DC_BITS[4] = len(_DC_SYMBOLS)
_AC_BITS = [0] * 17
_AC_BITS[9] = len(_AC_SYMBOLS)


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict:
    """DHT (bits, huffval) -> {symbol: (code, length)} per T.81 C.2."""
    out, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[symbols[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    """MSB-first bit packer with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)     # pad with 1-bits (spec)


def _magnitude(v: int) -> tuple[int, int]:
    """(SSSS category, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(H8, W8) float plane -> (n_blocks_y, n_blocks_x, 64) int32
    zigzagged quantized coefficients."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8) - 128.0)
    f = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.rint(f / qtab).astype(np.int32)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    """Huffman-encode one zigzagged block; returns the new DC pred."""
    dc = int(zz[0])
    ssss, bits = _magnitude(dc - pred)
    code, ln = _DC_CODES[ssss]
    w.write(code, ln)
    if ssss:
        w.write(bits, ssss)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]          # ZRL
            w.write(code, ln)
            run -= 16
        ssss, bits = _magnitude(v)
        code, ln = _AC_CODES[(run << 4) | ssss]
        w.write(code, ln)
        w.write(bits, ssss)
        run = 0
    if last < 63:
        code, ln = _AC_CODES[0x00]              # EOB
        w.write(code, ln)
    return dc


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(H, W) or (H, W, 1|3) uint8 -> baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 chroma (2x2-mean downsampled Cb/Cr);
    default is 4:4:4. Grayscale inputs produce a 1-component scan.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the resync mechanism a parallel decoder would shard on)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qlum, qchrom = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qids = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 mean over an edge-padded even grid
            cbp = _pad_edge(cb, 2)
            crp = _pad_edge(cr, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_y = -(-h // (8 * vmax))
    mcus_x = -(-w // (8 * hmax))
    coeffs = []
    for plane, (sh, sv), qid in zip(planes, samp, qids):
        # pad the component to a whole MCU grid (sv x sh blocks per MCU)
        th, tw = mcus_y * sv * 8, mcus_x * sh * 8
        padded = np.pad(plane, ((0, th - plane.shape[0]),
                                (0, tw - plane.shape[1])), mode="edge")
        qtab = qlum if qid == 0 else qchrom
        coeffs.append(_fdct_quant(padded, qtab))

    # entropy-coded scan: MCU raster order, per component sh*sv blocks
    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_idx = rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_idx
                    and mcu_idx % restart_interval == 0):
                writer.flush()
                writer.buf += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * len(planes)
            for ci, (sh, sv) in enumerate(samp):
                for v in range(sv):
                    for u in range(sh):
                        zz = coeffs[ci][my * sv + v, mx * sh + u]
                        preds[ci] = _encode_block(writer, zz, preds[ci])
            mcu_idx += 1
    writer.flush()

    # --- assemble the stream -------------------------------------------
    out = bytearray(b"\xff\xd8")                           # SOI
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00"         # APP0
                   + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += _marker(0xFFDB, b"\x00" + bytes(
        int(qlum.flat[z]) for z in ZIGZAG))                # DQT 0
    if not gray:
        out += _marker(0xFFDB, b"\x01" + bytes(
            int(qchrom.flat[z]) for z in ZIGZAG))          # DQT 1
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, qids[ci])
    out += _marker(0xFFC0, sof)                            # SOF0
    for cls, bits, syms in ((0, _DC_BITS, _DC_SYMBOLS),
                            (1, _AC_BITS, _AC_SYMBOLS)):
        for tid in range(1 if gray else 2):
            payload = bytes([(cls << 4) | tid]) \
                + bytes(bits[1:]) + bytes(syms)
            out += _marker(0xFFC4, payload)                # DHT
    if restart_interval:
        out += _marker(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += b"\x00\x3f\x00"
    out += _marker(0xFFDA, sos)                            # SOS
    out += writer.buf
    out += b"\xff\xd9"                                     # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    def __init__(self, seg: bytes):
        self.bits = np.unpackbits(np.frombuffer(seg, np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG entropy data")
        v = 0
        for b in self.bits[self.pos:self.pos + n]:
            v = (v << 1) | int(b)
        self.pos += n
        return v

    def read_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _decode_tables(bits: list[int], symbols: list[int]) -> dict:
    """DHT -> {(length, code): symbol}."""
    out, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = symbols[idx]
            code += 1
            idx += 1
        code <<= 1
    return out


def _split_scan(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy data from ``pos`` -> destuffed segments split at RSTn;
    returns (segments, position of the terminating marker)."""
    segs, cur = [], bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:                 # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                                     # EOI / next marker
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, C) uint8 with C = 1 or 3.

    Huffman + quant tables come from the stream, so any baseline
    sequential file decodes, including 4:2:0/4:2:2 subsampled ones;
    SOF2 progressive raises NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = []                       # (id, sh, sv, qid)
    h = w = None
    dri = 0
    scan_segs = None
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected in JPEG stream")
        tag = data[pos + 1]
        if tag == 0xD9:                      # EOI
            break
        ln = int.from_bytes(data[pos + 2:pos + 4], "big")
        seg = data[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if tag == 0xDB:                      # DQT (possibly several)
            o = 0
            while o < len(seg):
                prec_id = seg[o]
                if prec_id >> 4:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64, np.float64)
                t[ZIGZAG] = np.frombuffer(seg, np.uint8, 64, o + 1)
                qtabs[prec_id & 0xF] = t.reshape(8, 8)
                o += 65
        elif tag == 0xC4:                    # DHT (possibly several)
            o = 0
            while o < len(seg):
                cls_id = seg[o]
                bits = [0] + list(seg[o + 1:o + 17])
                cnt = sum(bits)
                syms = list(seg[o + 17:o + 17 + cnt])
                huff[(cls_id >> 4, cls_id & 0xF)] = _decode_tables(bits,
                                                                   syms)
                o += 17 + cnt
        elif tag == 0xC0 or tag == 0xC1:     # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for ci in range(nc):
                cid, sm, qid = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, sm >> 4, sm & 0xF, qid))
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) is supported")
        elif tag == 0xDD:                    # DRI
            dri = int.from_bytes(seg[:2], "big")
        elif tag == 0xDA:                    # SOS
            nc = seg[0]
            scan_comps = []
            for ci in range(nc):
                cid, tids = seg[1 + 2 * ci:3 + 2 * ci]
                scan_comps.append((cid, tids >> 4, tids & 0xF))
            scan_segs, pos = _split_scan(data, pos)
            break
        # other markers (APPn, COM) are skipped
    if h is None or scan_segs is None:
        raise ValueError("incomplete JPEG (missing SOF/SOS)")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = [by_id[sc[0]] for sc in scan_comps]
    tabs = [(huff[(0, sc[1])], huff[(1, sc[2])]) for sc in scan_comps]

    coeff = [np.zeros((mcus_y * sv, mcus_x * sh, 64), np.int32)
             for (_, sh, sv, _q) in order]
    preds = [0] * len(order)
    seg_i = 0
    reader = _BitReader(scan_segs[0])
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                seg_i += 1
                reader = _BitReader(scan_segs[seg_i])
                preds = [0] * len(order)
            for ci, (_, sh, sv, _q) in enumerate(order):
                dc_tab, ac_tab = tabs[ci]
                for v in range(sv):
                    for u in range(sh):
                        zz = np.zeros(64, np.int32)
                        ssss = reader.read_symbol(dc_tab)
                        diff = _extend(reader.read(ssss), ssss)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = reader.read_symbol(ac_tab)
                            if sym == 0x00:              # EOB
                                break
                            run, s = sym >> 4, sym & 0xF
                            if s == 0:
                                if run == 15:            # ZRL
                                    k += 16
                                    continue
                                break
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(reader.read(s), s)
                            k += 1
                        coeff[ci][my * sv + v, mx * sh + u] = zz
            mcu_count += 1

    out_planes = []
    for ci, (_, sh, sv, qid) in enumerate(order):
        cz = coeff[ci]
        by, bx = cz.shape[:2]
        blocks = np.zeros((by * bx, 64), np.float64)
        blocks[:, ZIGZAG] = cz.reshape(-1, 64)
        blocks = blocks.reshape(-1, 8, 8) * qtabs[qid]
        pix = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        plane = (pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(by * 8, bx * 8))
        # upsample to full-resolution grid, crop to (h, w)
        plane = np.repeat(np.repeat(plane, vmax // sv, axis=0),
                          hmax // sh, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
