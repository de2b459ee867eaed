"""Baseline JPEG (ITU-T T.81, SOF0 sequential DCT) codec in pure
stdlib + numpy — closes the last documented codec guard in the
multimodal column family (``operators/multimodal.py``; reference
anchor: the reference treats device payloads as opaque bytes, so any
pixel analytics parity lives entirely on this side).

Scope (baseline + progressive DCT, which together cover essentially
all real-world JPEGs):

- **Decoder**: baseline sequential (SOF0/1) AND progressive (SOF2,
  round 12 — spectral selection + successive approximation per T.81
  G.2, EOB runs, interleaved DC / non-interleaved AC scans), 8-bit
  samples, 1 or 3 components, any sampling factors in {1, 2} (4:4:4 /
  4:2:2 / 4:2:0), multiple DQT/DHT segments, restart intervals (DRI +
  RSTn), byte stuffing, 0xFF fill bytes before markers. Lossless/
  hierarchical SOFs, arithmetic coding, 12-bit precision, and
  4-component CMYK raise ``NotImplementedError`` loudly.
- **Encoder** (fixture-grade, spec-conformant output): sequential
  (4:4:4/4:2:0 colour or grayscale, Annex K tables, libjpeg-style
  quality knob, optional restart intervals) and progressive
  (``encode_jpeg_progressive`` — same quantized coefficients split
  across an arbitrary scan script, EOBn aggregation via a flat
  canonical AC table). Exists so the decoder is exercised against
  independently-constructed, marker-complete streams (this container
  ships no image library to make fixtures with) — and so sequential
  vs progressive decode of one image can be pinned BIT-IDENTICAL.

Everything hot is numpy: the IDCT/DCT are separable orthonormal-matrix
products over all of a component's blocks at once; upsampling is
``np.repeat``; colour conversion is vectorized BT.601. The only
per-element Python is the entropy coder's bit walk — unavoidable for
Huffman, and bounded by the entropy-coded byte count, not pixels.
Executor-side use goes through ``multimodal.decode_image`` inside
``mapInPandas`` (Arrow-batched), so the per-image cost parallelizes
across the corpus like every other decode.
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared tables -----------------------------------------------------------

#: zig-zag scan order: ZIGZAG[i] = raster index of the i-th scanned coeff
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

#: Annex K.1 base quantization tables (raster order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

#: Annex K.3 typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: dct2(B) = T @ B @ T.T,
    idct2(C) = T.T @ C @ T (T is orthogonal)."""
    n = np.arange(8)
    k = n.reshape(-1, 1)
    t = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    t[0, :] = np.sqrt(1 / 8)
    return t


_T = _dct_matrix()


def _blocks_idct(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks -> spatial samples,
    one einsum over every block at once."""
    return np.einsum("ki,nkl,lj->nij", _T, coeffs, _T, optimize=True)


def _blocks_dct(samples: np.ndarray) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _T, samples, _T, optimize=True)


def _build_huffman(bits, huffval):
    """(length, code) -> symbol map per T.81 C.2 canonical assignment."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _encode_huffman_sizes(bits, huffval):
    """symbol -> (code, length) — the encoder-side view of C.2."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return out


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a size-bit magnitude to its signed
    value (received < 2^(size-1) means negative)."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


class _BitReader:
    """Entropy-coded-segment bit reader: un-stuffs 0xFF 0x00, stops at
    markers (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy-coded segment"
                )
        out = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip the stuffed 00
        return out

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code (no symbol within 16 bits)")

    def align_to_marker(self) -> None:
        """Skip to the next byte boundary (before a RSTn marker)."""
        if self.bit:
            self.bit = 0
            self.pos += 1 + (1 if self.data[self.pos] == 0xFF else 0)


def decode_jpeg(data: bytes):
    """Decode a baseline JPEG. Returns (pixels, width, height, channels)
    with ``pixels`` a (height, width*channels) uint8 array — the same
    shape contract as ``multimodal._decode_png``."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    frame = None
    restart_interval = 0
    prog_state = None  # per-component zigzag coefficient grids (SOF2)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code — the code is the first non-0xFF byte
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG (fill bytes run to EOF)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qt[tq] = np.frombuffer(
                    body[p : p + 64], dtype=np.uint8
                ).astype(np.float64)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, vals
                )
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG precision")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG (CMYK?)")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            for c in comps:
                if c["h"] not in (1, 2) or c["v"] not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {c['h']}x{c['v']}"
                    )
            frame = {"w": w, "h": h, "comps": comps,
                     "prog": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-DCT/arithmetic JPEG (SOF marker 0xFF{marker:02X}: "
                "lossless/hierarchical/arithmetic coding)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                sel[cs] = {"dc": tt >> 4, "ac": tt & 0xF}
            if not frame.get("prog"):
                return _decode_scan(
                    data, pos + seglen, frame, sel, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            # SOF2: accumulate this scan into the coefficient state and
            # keep walking markers — reconstruction happens at EOI
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            a = body[3 + 2 * ns]
            if prog_state is None:
                prog_state = _prog_init(frame)
            pos = _prog_scan(
                data, pos + seglen, frame, sel, ss, se, a >> 4, a & 0xF,
                prog_state, qt, huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen
    if prog_state is not None:
        return _prog_reconstruct(frame, prog_state, qt)
    raise ValueError("no SOS segment (truncated JPEG?)")


def _decode_scan(
    data, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval
):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise ValueError("JPEG frame with zero dimension")
    # validate the scan's references BEFORE entropy decoding, so a
    # corrupted SOS/SOF/DHT/DQT surfaces as a typed refusal instead of
    # a raw KeyError deep in the MCU loop
    for c in comps:
        if c["id"] not in sel:
            raise ValueError(
                f"SOS selects no entropy tables for component {c['id']}"
            )
        if c["tq"] not in qt:
            raise ValueError(
                f"component {c['id']} references missing DQT table "
                f"{c['tq']}"
            )
        if sel[c["id"]]["dc"] not in huff_dc or sel[c["id"]]["ac"] not in huff_ac:
            raise ValueError(
                f"component {c['id']} references missing DHT table(s)"
            )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per component: coefficient block grid sized to the MCU cover
    planes = []
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((bh * bw, 8, 8), dtype=np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_to_marker()
            if (
                data[reader.pos] == 0xFF
                and 0xD0 <= data[reader.pos + 1] <= 0xD7
            ):
                reader.pos += 2
                pred = [0] * len(comps)
            else:
                raise ValueError(
                    f"expected restart marker before MCU {m}"
                )
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            tdc = huff_dc[sel[c["id"]]["dc"]]
            tac = huff_ac[sel[c["id"]]["ac"]]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.float64)
                    size = reader.decode_symbol(tdc)
                    diff = _extend(reader.read_bits(size), size)
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(tac)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = zz * q
                    gx = mx * c["h"] + bx
                    gy = my * c["v"] + by
                    planes[ci][gy * (mcux * c["h"]) + gx] = block.reshape(
                        8, 8
                    )
    return _assemble(frame, planes, mcux, mcuy)


def _assemble(frame, coef_blocks, mcux, mcuy):
    """Inverse-transform every component's DEQUANTIZED raster blocks at
    once, assemble the block grids, upsample to full resolution, and
    colour-convert — the shared tail of the sequential and progressive
    decode paths."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    out_planes = []
    for ci, c in enumerate(comps):
        bw, bh = mcux * c["h"], mcuy * c["v"]
        spatial = _blocks_idct(coef_blocks[ci]) + 128.0
        grid = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(bh * 8, bw * 8)
        plane = np.repeat(
            np.repeat(plane, hmax // c["h"], axis=1), vmax // c["v"], axis=0
        )
        out_planes.append(plane[:h, :w])
    if len(comps) == 1:
        px = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return px.reshape(h, w), w, h, 1
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return px.reshape(h, w * 3), w, h, 3


# -- progressive decode (SOF2, T.81 G.2) -------------------------------------


def _mcu_grid(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _noninterleaved_dims(frame, c):
    """(blocks wide, blocks high) of ONE component's non-interleaved
    scan coverage (T.81 A.2.2): ceil over the component's own sample
    dimensions, NOT the MCU-padded grid."""
    hmax, vmax, _, _ = _mcu_grid(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _prog_init(frame):
    """Per-component zigzag-order coefficient grids sized to the MCU
    cover, accumulated across scans. int64: successive-approximation
    refinement is BITWISE on two's-complement values."""
    _, _, mcux, mcuy = _mcu_grid(frame)
    return [
        np.zeros((mcuy * c["v"] * mcux * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    ]


def _prog_scan(
    data, pos, frame, sel, ss, se, ah, al, coefs, qt, huff_dc, huff_ac,
    restart_interval,
):
    """Decode ONE progressive scan (T.81 G.2: spectral selection +
    successive approximation; the refinement control flow follows the
    spec's G.1.2.2-G.1.2.3 procedures) into the accumulated
    coefficient state. Returns the stream position just past this
    scan's entropy-coded data."""
    comps = frame["comps"]
    scomps = []  # (component index, component dict) in SOS order
    for cs in sel:
        matches = [i for i, c in enumerate(comps) if c["id"] == cs]
        if not matches:
            raise ValueError(f"SOS selects unknown component {cs}")
        scomps.append((matches[0], comps[matches[0]]))
    if ss > se or se > 63:
        raise ValueError(f"invalid spectral selection {ss}..{se}")
    dc_scan = ss == 0
    if dc_scan and se != 0:
        raise ValueError(
            "progressive scan mixing DC and AC coefficients (Ss=0 "
            f"with Se={se})"
        )
    if not dc_scan and len(scomps) != 1:
        raise ValueError("progressive AC scan must select one component")
    first = ah == 0
    if not first and ah != al + 1:
        raise ValueError(
            f"successive approximation must refine one bit (Ah={ah}, "
            f"Al={al})"
        )
    # table references validated BEFORE entropy decoding (same typed-
    # refusal discipline as the sequential path); DC refinement scans
    # read raw bits and need no table at all
    for _, c in scomps:
        if dc_scan and first and sel[c["id"]]["dc"] not in huff_dc:
            raise ValueError(
                f"component {c['id']} references missing DC table"
            )
        if not dc_scan and sel[c["id"]]["ac"] not in huff_ac:
            raise ValueError(
                f"component {c['id']} references missing AC table"
            )
    hmax, vmax, mcux, mcuy = _mcu_grid(frame)
    reader = _BitReader(data, pos)
    pred = {ci: 0 for ci, _ in scomps}
    state = {"eobrun": 0}
    p1 = 1 << al

    def _correct(blk, k):
        # T.81 G.1.2.3 correction bit: append a 1-bit at position Al
        # of an already-nonzero coefficient's magnitude if not set
        if reader.read_bit() and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else -p1

    def _decode_dc(ci, c, blk):
        if first:
            size = reader.decode_symbol(huff_dc[sel[c["id"]]["dc"]])
            diff = _extend(reader.read_bits(size), size)
            pred[ci] += diff
            blk[0] = pred[ci] << al
        elif reader.read_bit():
            blk[0] = int(blk[0]) | p1

    def _decode_ac_first(c, blk):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        tac = huff_ac[sel[c["id"]]["ac"]]
        k = ss
        while k <= se:
            rs = reader.decode_symbol(tac)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past spectral band end")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def _decode_ac_refine(c, blk):
        tac = huff_ac[sel[c["id"]]["ac"]]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode_symbol(tac)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.read_bits(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "AC refinement symbol with size > 1"
                        )
                    newval = p1 if reader.read_bit() else -p1
                # advance r zero-history positions, emitting correction
                # bits for already-nonzero coefficients along the way
                while k <= se:
                    if blk[k] != 0:
                        _correct(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s:
                    if k > se:
                        raise ValueError(
                            "AC refinement run past spectral band end"
                        )
                    blk[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    _correct(blk, k)
                k += 1
            state["eobrun"] -= 1

    def _decode_unit(ci, c, idx):
        blk = coefs[ci][idx]
        if dc_scan:
            _decode_dc(ci, c, blk)
        elif first:
            _decode_ac_first(c, blk)
        else:
            _decode_ac_refine(c, blk)

    def _maybe_restart(unit):
        if restart_interval and unit and unit % restart_interval == 0:
            reader.align_to_marker()
            if (
                data[reader.pos] == 0xFF
                and 0xD0 <= data[reader.pos + 1] <= 0xD7
            ):
                reader.pos += 2
                for ci in pred:
                    pred[ci] = 0
                state["eobrun"] = 0
            else:
                raise ValueError(f"expected restart marker at unit {unit}")

    if dc_scan and len(scomps) > 1:
        # interleaved (MCU order), like the sequential path
        for m in range(mcux * mcuy):
            _maybe_restart(m)
            my, mx = divmod(m, mcux)
            for ci, c in scomps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        gx, gy = mx * c["h"] + bx, my * c["v"] + by
                        _decode_unit(
                            ci, c, gy * (mcux * c["h"]) + gx
                        )
    else:
        # non-interleaved: raster over the component's OWN block cover
        ci, c = scomps[0]
        cbw, cbh = _noninterleaved_dims(frame, c)
        row = mcux * c["h"]  # storage-grid row stride
        for u in range(cbw * cbh):
            _maybe_restart(u)
            by, bx = divmod(u, cbw)
            _decode_unit(ci, c, by * row + bx)
    reader.align_to_marker()
    return reader.pos


def _prog_reconstruct(frame, coefs, qt):
    """Dequantize the accumulated coefficient grids and run the shared
    IDCT/assembly tail."""
    _, _, mcux, mcuy = _mcu_grid(frame)
    blocks = []
    for ci, c in enumerate(frame["comps"]):
        if c["tq"] not in qt:
            raise ValueError(
                f"component {c['id']} references missing DQT table "
                f"{c['tq']}"
            )
        zz = coefs[ci].astype(np.float64) * qt[c["tq"]][None, :]
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz
        blocks.append(raster.reshape(-1, 8, 8))
    return _assemble(frame, blocks, mcux, mcuy)


# -- encoder (fixture-grade, spec-conformant) --------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality -> scaling convention (50 = Annex K verbatim)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 / quality if quality < 50 else 200 - quality * 2
    out = np.floor((q * scale + 50) / 100)
    return np.clip(out, 1, 255)


def _encode_block(writer, zz, pred, dc_tab, ac_tab):
    diff = int(zz[0]) - pred
    size = int(diff).bit_length() if diff else 0
    code, length = dc_tab[size]
    writer.write(code, length)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    last = (last_nz[-1] + 1) if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = abs(v).bit_length()
        code, length = ac_tab[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _frame_setup(pixels: np.ndarray, quality: int, subsampling: str):
    """Shared encoder front half: colour-convert, subsample, block,
    DCT, quantize. Returns (h, w, hv, qts, tabs, comp_zz, mcux, mcuy)
    — ``comp_zz`` are zigzag-order quantized coefficients per
    component on the MCU-padded grid, the single source both the
    sequential and progressive scan writers serialize (so the two
    encodings of one image carry IDENTICAL coefficients — the
    round-trip equality the conformance tests pin)."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError(f"expected (h,w) or (h,w,3) pixels, got {px.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    h, w = px.shape[:2]
    if gray:
        planes = [px]
        qts = [(_quality_scale(_QT_LUMA, quality), 0)]
        tabs = [(_DC_LUMA, _AC_LUMA, 0)]
        hv = [(1, 1)]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        ql = _quality_scale(_QT_LUMA, quality)
        qc = _quality_scale(_QT_CHROMA, quality)
        qts = [(ql, 0), (qc, 1), (qc, 1)]
        tabs = [
            (_DC_LUMA, _AC_LUMA, 0),
            (_DC_CHROMA, _AC_CHROMA, 1),
            (_DC_CHROMA, _AC_CHROMA, 1),
        ]
        if subsampling == "420":
            hv = [(2, 2), (1, 1), (1, 1)]

            def _box2(p):
                hh, ww = p.shape
                ph, pw = -(-hh // 2) * 2, -(-ww // 2) * 2
                pp = np.pad(
                    p, ((0, ph - hh), (0, pw - ww)), mode="edge"
                )
                return pp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

            planes = [y, _box2(cb), _box2(cr)]
        else:
            hv = [(1, 1)] * 3

    hmax = max(h_ for h_, _ in hv)
    vmax = max(v_ for _, v_ in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_zz = []
    for i, plane in enumerate(planes):
        ch_, cv_ = hv[i]
        ph, pw = mcuy * cv_ * 8, mcux * ch_ * 8
        hh, ww = plane.shape
        padded = np.pad(
            plane, ((0, ph - hh), (0, pw - ww)), mode="edge"
        )
        blocks = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coeffs = _blocks_dct(blocks - 128.0)
        q = qts[i][0]
        zz = np.round(
            coeffs.reshape(-1, 64)[:, ZIGZAG] / q[ZIGZAG]
        ).astype(np.int64)
        comp_zz.append(zz)
    return h, w, hv, qts, tabs, comp_zz, mcux, mcuy


def _emit_headers(h, w, hv, qts, tabs, restart_interval, sof_marker):
    """SOI + DQT + SOF + DHT (+ DRI) segments shared by the sequential
    and progressive encoders. Returns (bytes, per-component encode
    tables)."""
    out = bytearray(b"\xff\xd8")  # SOI
    seen_q = {}
    for q, tq in qts:
        if tq in seen_q:
            continue
        seen_q[tq] = q
        body = bytes([tq]) + bytes(q.astype(np.uint8)[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    ncomp = len(hv)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], qts[i][1]])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    seen_h = set()
    enc_tabs = []
    for (dc, ac, th) in tabs:
        enc_tabs.append(
            (_encode_huffman_sizes(*dc), _encode_huffman_sizes(*ac))
        )
        for tc, (bits, vals) in ((0, dc), (1, ac)):
            if (tc, th) in seen_h:
                continue
            seen_h.add((tc, th))
            body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out, enc_tabs


def encode_jpeg(
    pixels: np.ndarray, quality: int = 85, restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 pixels as a
    baseline JPEG (``subsampling``: "444" or "420"; restart interval is
    in MCUs)."""
    h, w, hv, qts, tabs, comp_zz, mcux, mcuy = _frame_setup(
        pixels, quality, subsampling
    )
    ncomp = len(hv)
    out, enc_tabs = _emit_headers(
        h, w, hv, qts, tabs, restart_interval, 0xC0
    )
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, (tabs[i][2] << 4) | tabs[i][2]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # entropy-coded data: quantized zig-zag blocks per component,
    # interleaved per MCU (per T.81 A.2.3 — h*v blocks of each
    # component per MCU, raster within the MCU)
    writer = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
            pred = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            ch_, cv_ = hv[ci]
            for by in range(cv_):
                for bx in range(ch_):
                    gy = my * cv_ + by
                    gx = mx * ch_ + bx
                    idx = gy * (mcux * ch_) + gx
                    pred[ci] = _encode_block(
                        writer, comp_zz[ci][idx], pred[ci],
                        enc_tabs[ci][0], enc_tabs[ci][1],
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- progressive encoder (fixture-grade, T.81 G.1) ---------------------------

#: AC table for progressive scans: Annex K's tables have NO free code
#: space for the EOBn symbols (verified — appending 14 length-16 codes
#: overflows the canonical space), so progressive scans use a flat
#: canonical 8-bit table covering every (run, size<=14) symbol plus
#: ZRL and EOB0..EOB14. Fixture-grade compression, full decoder
#: coverage (EOB runs > 1 included).
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [0x00, 0xF0]
        + [n << 4 for n in range(1, 15)]
        + [(r << 4) | s for s in range(1, 15) for r in range(16)]
    ),
)


def _flush_eobrun(writer, ac_tab, st):
    """Emit the pending EOBn symbol + its extension bits + the
    buffered correction bits (T.81 G.1.2.2 EOB-run discipline)."""
    n = st["eobrun"]
    if n > 0:
        nbits = n.bit_length() - 1
        code, ln = ac_tab[nbits << 4]
        writer.write(code, ln)
        if nbits:
            writer.write(n & ((1 << nbits) - 1), nbits)
        for b in st["bits"]:
            writer.write(b, 1)
        st["eobrun"] = 0
        st["bits"] = []


def _enc_dc_first(writer, zz, pred, dc_tab, al):
    v = int(zz[0]) >> al  # arithmetic shift — T.81 G.1.2.1 point transform
    diff = v - pred
    size = int(diff).bit_length() if diff else 0
    code, ln = dc_tab[size]
    writer.write(code, ln)
    if size:
        writer.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    return v


def _enc_ac_first(writer, zz, ss, se, al, ac_tab, st):
    r = 0
    for k in range(ss, se + 1):
        t = int(zz[k])
        mag = abs(t) >> al  # magnitude shift — G.1.2.2 point transform
        if mag == 0:
            r += 1
            continue
        _flush_eobrun(writer, ac_tab, st)
        while r > 15:
            code, ln = ac_tab[0xF0]
            writer.write(code, ln)
            r -= 16
        size = mag.bit_length()
        code, ln = ac_tab[(r << 4) | size]
        writer.write(code, ln)
        sv = mag if t >= 0 else -mag
        writer.write(sv if sv > 0 else sv + (1 << size) - 1, size)
        r = 0
    if r > 0:
        st["eobrun"] += 1
        if st["eobrun"] >= 0x7FFF:
            _flush_eobrun(writer, ac_tab, st)


def _enc_ac_refine(writer, zz, ss, se, al, ac_tab, st):
    """One block of an AC successive-approximation refinement scan
    (G.1.2.3): newly-nonzero coefficients as (run-of-zero-history, 1)
    symbols + sign, already-nonzero ones as buffered correction bits
    emitted after the next symbol (or with the EOB run)."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = ss - 1  # position of the LAST newly-nonzero coefficient
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k
    r = 0
    br: list = []  # this block's pending correction bits
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eobrun(writer, ac_tab, st)
            code, ln = ac_tab[0xF0]
            writer.write(code, ln)
            r -= 16
            for b in br:
                writer.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        _flush_eobrun(writer, ac_tab, st)
        code, ln = ac_tab[(r << 4) | 1]
        writer.write(code, ln)
        writer.write(0 if int(zz[k]) < 0 else 1, 1)
        for b in br:
            writer.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st["eobrun"] += 1
        st["bits"].extend(br)
        if st["eobrun"] >= 0x7FFF or len(st["bits"]) > 900:
            _flush_eobrun(writer, ac_tab, st)


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0, scans=None,
) -> bytes:
    """Encode pixels as a PROGRESSIVE JPEG (SOF2) carrying the SAME
    quantized coefficients as ``encode_jpeg`` would — spectral
    selection + successive approximation split across ``scans``
    (a list of ``(component_indices, Ss, Se, Ah, Al)``; a libjpeg-like
    default script when None). Decoding both encodings of one image
    must therefore be bit-identical — the conformance identity the
    tests pin."""
    h, w, hv, qts, tabs, comp_zz, mcux, mcuy = _frame_setup(
        pixels, quality, subsampling
    )
    ncomp = len(hv)
    prog_tabs = [(dc, _AC_PROG, th) for (dc, _ac, th) in tabs]
    out, enc_tabs = _emit_headers(
        h, w, hv, qts, prog_tabs, restart_interval, 0xC2
    )
    if scans is None:
        if ncomp == 1:
            scans = [
                ([0], 0, 0, 0, 1),
                ([0], 1, 63, 0, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0),
            ]
        else:
            scans = [
                ([0, 1, 2], 0, 0, 0, 1),
                ([0], 1, 5, 0, 2),
                ([2], 1, 63, 0, 1),
                ([1], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1),
                ([0, 1, 2], 0, 0, 1, 0),
                ([0], 1, 63, 1, 0),
                ([2], 1, 63, 1, 0),
                ([1], 1, 63, 1, 0),
            ]
    hmax = max(h_ for h_, _ in hv)
    vmax = max(v_ for _, v_ in hv)
    for comps_idx, ss, se, ah, al in scans:
        dc_scan = ss == 0
        if not dc_scan and len(comps_idx) != 1:
            raise ValueError("progressive AC scan must select one component")
        sos = bytes([len(comps_idx)])
        for i in comps_idx:
            th = tabs[i][2]
            sos += bytes([i + 1, (th << 4) | th])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        writer = _BitWriter()
        st = {"eobrun": 0, "bits": []}
        pred = {i: 0 for i in comps_idx}
        rst = 0
        unit = 0

        def _restart_if_due():
            nonlocal writer, rst
            if restart_interval and unit and unit % restart_interval == 0:
                _flush_eobrun(writer, enc_tabs[comps_idx[0]][1], st)
                writer.flush()
                out.extend(writer.out)
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                writer = _BitWriter()
                for i in pred:
                    pred[i] = 0

        def _unit_block(i, idx):
            blk = comp_zz[i][idx]
            dc_tab, ac_tab = enc_tabs[i]
            if dc_scan:
                if ah == 0:
                    pred[i] = _enc_dc_first(writer, blk, pred[i], dc_tab, al)
                else:
                    writer.write((int(blk[0]) >> al) & 1, 1)
            elif ah == 0:
                _enc_ac_first(writer, blk, ss, se, al, ac_tab, st)
            else:
                _enc_ac_refine(writer, blk, ss, se, al, ac_tab, st)

        if dc_scan and len(comps_idx) > 1:
            for m in range(mcux * mcuy):
                _restart_if_due()
                unit += 1
                my, mx = divmod(m, mcux)
                for i in comps_idx:
                    ch_, cv_ = hv[i]
                    for by in range(cv_):
                        for bx in range(ch_):
                            gy, gx = my * cv_ + by, mx * ch_ + bx
                            _unit_block(i, gy * (mcux * ch_) + gx)
        else:
            i = comps_idx[0]
            ch_, cv_ = hv[i]
            cw = -(-w * ch_ // hmax)
            chh = -(-h * cv_ // vmax)
            cbw, cbh = -(-cw // 8), -(-chh // 8)
            row = mcux * ch_
            for u in range(cbw * cbh):
                _restart_if_due()
                unit += 1
                by, bx = divmod(u, cbw)
                _unit_block(i, by * row + bx)
        _flush_eobrun(writer, enc_tabs[comps_idx[0]][1], st)
        writer.flush()
        out.extend(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
