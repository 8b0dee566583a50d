"""Pure-NumPy baseline JPEG (JFIF) codec.

The reference decodes images with ``cv2.imdecode``
(``toddleocr/engine.py:214-216``), which in the wild sees JPEG first.
No codec library ships in this environment, so — like the repo's PNG /
BMP / PPM / GIF decoders — the format is implemented from the public
spec (ITU-T T.81 baseline sequential DCT):

- marker parse: DQT (8/16-bit tables), DHT (canonical Huffman from
  counts+symbols), SOF0 (components + h/v subsampling), SOS, DRI
- entropy decode: byte-unstuffed MSB-first bit reader, Huffman DC
  category + extend, AC run/size with EOB and ZRL, restart-marker
  resync (DC predictors + bit buffer reset)
- block reconstruction: dequantize, de-zigzag, batched 8×8 IDCT
  (one einsum over all blocks of a component — the vectorized part),
  chroma upsample by sample replication, YCbCr→BGR (BT.601 / JFIF)

Out of scope (explicit errors, not wrong pixels): progressive (SOF2),
arithmetic coding, 12-bit precision, CMYK. The Huffman bit loop is
sequential Python — inherent to the format's entropy coding; at scale
each image decodes inside one mapInPandas task, so the sequential part
parallelizes across media exactly like the reference's per-image loop.

``encode_jpeg`` is the test-fixture twin: baseline, 4:4:4/4:2:2/4:2:0 or
grayscale, with self-describing canonical Huffman tables (all-DC-
symbols length 4, all-AC-symbols length 8 — a valid, intentionally
simple code), so decoder tests are a genuine two-party interop check
on the wire format, not a shared-helper round-trip.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

# zigzag scan order: index i of the scan holds block position ZZ[i]
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8-point DCT-II basis: C[k, n] = s(k) cos((2n+1)kπ/16)
_N = np.arange(8)
_DCT = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16)
_DCT[0] *= 1 / np.sqrt(2)
_DCT *= 0.5


def _build_huffman(counts, symbols):
    """Canonical Huffman per T.81 Annex C: {(length, code): symbol}."""
    table = {}
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
    """MSB-first reader over entropy-coded bytes (already unstuffed)."""

    def __init__(self, data: bytes, pos: int = 0):
        # `pos` lets restart resync re-aim the reader INTO the shared
        # unstuffed buffer — re-slicing bytes(ecs[next_restart:]) per
        # restart was O(restarts x stream) memcpy on scanned pages
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
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

    def decode_symbol(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) float samples."""
    return np.einsum("ki,nkl,lj->nij", _DCT, coefs, _DCT)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → (H, W, 3) uint8 BGR (gray replicates to 3ch)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    i = 2
    scan_comps = None
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: a marker may be preceded by any number of
        # 0xFF fill bytes — treating a fill byte as the marker would
        # read a garbage segment length from the real marker byte
        while data[i + 1] == 0xFF:
            i += 1
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[i:i + 2])
        seg = data[i + 2:i + seglen]
        i += seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 15
                p += 1
                if prec:
                    tbl = np.frombuffer(seg[p:p + 128], ">u2").astype(
                        np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(seg[p:p + 64], np.uint8).astype(
                        np.int64)
                    p += 64
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17:p + 17 + n])
                huff[(cls, tid)] = _build_huffman(counts, symbols)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0) "
                             "supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tids = seg[1 + 2 * c:3 + 2 * c]
                scan_comps.append({"id": cid, "dc": tids >> 4,
                                   "ac": tids & 15})
            break  # entropy-coded data follows at offset i
    if frame is None or scan_comps is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")
    if len(scan_comps) != len(frame["comps"]):
        # a legal baseline file may carry one scan per component;
        # decoding only the first with interleaved-MCU geometry would
        # mis-assemble luma and zero the chroma — refuse explicitly
        raise ValueError("non-interleaved (multi-scan) baseline JPEG "
                         "unsupported")

    # unstuff entropy bytes; note restart-marker positions
    ecs = bytearray()
    restarts = []  # unstuffed offsets where a RSTn occurred
    p = i
    while p < len(data) - 1:
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00:
                ecs.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                restarts.append(len(ecs))
                p += 2
                continue
            break  # EOI or next marker
        ecs.append(b)
        p += 1

    comps = frame["comps"]
    if len(comps) == 1:
        # T.81 A.2: a single-component scan is NON-interleaved — the
        # MCU is one 8x8 data unit and the component's effective
        # sampling is full resolution (x_i = ceil(w*h_i/hmax) = w when
        # the frame has one component). Grayscale files commonly carry
        # hv=0x22 (libjpeg's default); decoding them with interleaved
        # 4-blocks-per-16x16-MCU geometry would consume blocks in the
        # wrong order/count. Normalizing h=v=1 yields exactly the
        # spec's data-unit raster order (and the spec's restart-
        # interval unit, which counts data units here).
        comps = [{**comps[0], "h": 1, "v": 1}]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    # per-component coefficient planes in block units
    planes = {c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 8, 8),
                                dtype=np.int64) for c in comps}
    ecs_b = bytes(ecs)
    reader = _BitReader(ecs_b)
    pred = {c["id"]: 0 for c in comps}
    restart_iter = iter(restarts)
    next_restart = next(restart_iter, None)
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            # resync: re-aim the reader at the recorded restart
            # boundary (no per-restart tail copy)
            if next_restart is None:
                raise ValueError("missing JPEG restart marker")
            reader = _BitReader(ecs_b, next_restart)
            next_restart = next(restart_iter, None)
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for sc in scan_comps:
            comp = by_id[sc["id"]]
            dct = huff[(0, sc["dc"])]
            act = huff[(1, sc["ac"])]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = reader.decode_symbol(dct)
                    diff = _extend(reader.read_bits(size), size)
                    pred[sc["id"]] += diff
                    zz[0] = pred[sc["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.int64)
                    block[ZIGZAG] = zz * qt[comp["tq"]]
                    planes[sc["id"]][my * comp["v"] + by,
                                     mx * comp["h"] + bx] = \
                        block.reshape(8, 8)

    # IDCT all blocks of each component at once, assemble, upsample
    out_ch = []
    for c in comps:
        pl = planes[c["id"]]
        by, bx = pl.shape[:2]
        pix = _idct_blocks(pl.reshape(-1, 8, 8)) + 128.0
        pix = (pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3)
               .reshape(by * 8, bx * 8))
        pix = np.repeat(np.repeat(pix, vmax // c["v"], axis=0),
                        hmax // c["h"], axis=1)
        out_ch.append(pix[:frame["h"], :frame["w"]])
    if len(out_ch) == 1:
        y = np.clip(np.round(out_ch[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = out_ch[0], out_ch[1] - 128.0, out_ch[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    bgr = np.stack([b, g, r], axis=2)
    return np.clip(np.round(bgr), 0, 255).astype(np.uint8)


# --- encoder (test-fixture twin) --------------------------------------

# DC: 12 symbols, all code length 4 (12/16 Kraft-valid); AC: EOB, ZRL
# and every (run 0-15, size 1-10) pair, all code length 8 (162/256).
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [r * 16 + s for r in range(16)
                           for s in range(1, 11)]


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8
_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _size_of(v: int) -> int:
    return 0 if v == 0 else int(v).bit_length() if v > 0 \
        else int(-v).bit_length()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int) -> int:
    diff = int(zz[0]) - pred
    size = _size_of(diff)
    length, code = _DC_CODES[size]
    w.write(code, length)
    if size:
        w.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0].max()) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = _AC_CODES[0xF0]
            w.write(code, length)
            run -= 16
        size = _size_of(v)
        length, code = _AC_CODES[run * 16 + size]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        length, code = _AC_CODES[0x00]
        w.write(code, length)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quant: int = 1,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 BGR or (H, W) gray → baseline JFIF bytes.

    ``quant`` is a flat quantization value (1 = near-lossless, only
    DCT rounding); ``subsampling`` is "444", "422" or "420" (color
    only); ``restart_interval`` > 0 writes DRI + RSTn markers every
    that many MCUs (exercises the decoder's resync path)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qtab = np.full(64, quant, dtype=np.int64)
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0,
                  "plane": img.astype(np.float64) - 128.0}]
    else:
        b, g, r = (img[:, :, k].astype(np.float64) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            def down(p):
                hh, ww = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                q = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                           mode="edge")
                return (q[0::2, 0::2] + q[1::2, 0::2] + q[0::2, 1::2]
                        + q[1::2, 1::2]) / 4.0
            comps = [{"id": 1, "h": 2, "v": 2, "tq": 0, "plane": y - 128.0},
                     {"id": 2, "h": 1, "v": 1, "tq": 0,
                      "plane": down(cb) - 128.0},
                     {"id": 3, "h": 1, "v": 1, "tq": 0,
                      "plane": down(cr) - 128.0}]
        elif subsampling == "422":
            # horizontal-only chroma downsample (scanner default)
            def down_h(p):
                ww = -(-p.shape[1] // 2) * 2
                q = np.pad(p, ((0, 0), (0, ww - p.shape[1])), mode="edge")
                return (q[:, 0::2] + q[:, 1::2]) / 2.0
            comps = [{"id": 1, "h": 2, "v": 1, "tq": 0, "plane": y - 128.0},
                     {"id": 2, "h": 1, "v": 1, "tq": 0,
                      "plane": down_h(cb) - 128.0},
                     {"id": 3, "h": 1, "v": 1, "tq": 0,
                      "plane": down_h(cr) - 128.0}]
        else:
            comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y - 128.0},
                     {"id": 2, "h": 1, "v": 1, "tq": 0, "plane": cb - 128.0},
                     {"id": 3, "h": 1, "v": 1, "tq": 0, "plane": cr - 128.0}]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad planes to whole MCUs and forward-DCT every block up front
    zz_all = {}
    for c in comps:
        p = c["plane"]
        ph, pw = mcus_y * c["v"] * 8, mcus_x * c["h"] * 8
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        blocks = (p.reshape(ph // 8, 8, pw // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        # forward 2-D DCT F = C f C^T (the decoder inverts with
        # f = C^T F C over the same orthonormal basis)
        coefs = np.einsum("ik,nkl,jl->nij", _DCT, blocks, _DCT)
        q = np.round(coefs / qtab.reshape(8, 8)).astype(np.int64)
        zz_all[c["id"]] = q.reshape(ph // 8, pw // 8, 8, 8)
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    dq = bytes([0]) + bytes(int(qtab[i]) for i in range(64))
    seg(0xDB, dq)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    seg(0xC0, sof)
    dht = bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMS)
    seg(0xC4, dht)
    dht = bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMS)
    seg(0xC4, dht)
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    wtr = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            wtr.flush()
            rst = 0xD0 + ((m // restart_interval - 1) % 8)
            wtr.out.extend(bytes([0xFF, rst]))
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = zz_all[c["id"]][my * c["v"] + by,
                                          mx * c["h"] + bx]
                    zz = blk.reshape(64)[ZIGZAG]
                    pred[c["id"]] = _encode_block(wtr, zz, pred[c["id"]])
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
