"""Minimal baseline-JPEG *encoder* used only to build golden test inputs.

Assembles spec-conformant T.81 baseline files from explicit per-block
coefficient lists: DQT/SOF0/DHT/SOS segments plus a Huffman-coded entropy
stream. Shares ONLY the Annex-C code-assignment helper with the decoder
(that construction is spec-defined); everything else — bit packing, byte
stuffing, marker layout — is written independently here, so the
decode-side test is a genuine differential.
"""

from __future__ import annotations

from open_ftth_relational_projector_spark.functions.jpeg import (
    ZIGZAG,
    _build_huffman,
)

# T.81 Annex K.3.3 typical luminance DC/AC tables (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = bytes(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = bytes(
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
    ]
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _inv(table: dict[tuple[int, int], int]) -> dict[int, tuple[int, int]]:
    return {v: (ln, code) for (ln, code), v in table.items()}


def _category(v: int) -> int:
    return 0 if v == 0 else v.bit_length() if v > 0 else (-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(
    width: int,
    height: int,
    blocks_per_comp: list[list[list[int]]],
    sampling: list[tuple[int, int]],
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Build a baseline JPEG whose entropy stream encodes exactly the
    given per-component, per-block coefficient lists (NATURAL order,
    64 ints each, already-quantized values; blocks in MCU traversal
    order). One shared quant table (all-16s by default, scaled DC) and
    the Annex-K luminance Huffman tables for every component."""
    q = quant or [16] * 64
    nc = len(blocks_per_comp)
    seg = bytearray(b"\xff\xd8")
    seg += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0])
    # DQT stores the table in zigzag order; `q` is natural (row-major)
    seg += bytes(q[ZIGZAG[k]] for k in range(64))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(nc)
    for c in range(nc):
        hs, vs = sampling[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    seg += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        dht = bytes([cls << 4]) + bytes(bits) + vals
        seg += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    if restart_interval:
        seg += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    sos = bytearray([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += b"\x00\x3f\x00"
    seg += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    dc_codes = _inv(_build_huffman(DC_BITS, DC_VALS))
    ac_codes = _inv(_build_huffman(AC_BITS, AC_VALS))

    # interleave blocks in MCU order: caller passes blocks already in MCU
    # traversal order per component; emit per MCU: comp0 blocks, comp1, ...
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    idx = [0] * nc
    pred = [0] * nc
    w = _BitWriter()
    entropy = bytearray()
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            entropy += w.flush()
            w = _BitWriter()
            entropy += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * nc
        for c in range(nc):
            hs, vs = sampling[c]
            for _ in range(hs * vs):
                coef = blocks_per_comp[c][idx[c]]
                idx[c] += 1
                diff = coef[0] - pred[c]
                pred[c] = coef[0]
                t = _category(diff)
                ln, code = dc_codes[t]
                w.put(code, ln)
                if t:
                    w.put(_magnitude_bits(diff, t), t)
                run = 0
                for k in range(1, 64):
                    v = coef[ZIGZAG[k]]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        w.put(code, ln)
                        run -= 16
                    s = _category(v)
                    ln, code = ac_codes[(run << 4) | s]
                    w.put(code, ln)
                    w.put(_magnitude_bits(v, s), s)
                    run = 0
                if run:
                    ln, code = ac_codes[0x00]
                    w.put(code, ln)
    entropy += w.flush()
    return bytes(seg) + bytes(entropy) + b"\xff\xd9"


# Progressive AC scans need EOBn symbols (r<<4 with size 0, r=1..14) that
# the Annex-K BASELINE table omits (baseline only uses 0x00 EOB and 0xF0
# ZRL). A flat 9-bit canonical table over all 176 run/size symbols keeps
# the golden encoder simple and spec-legal (Annex C: 176 codes of length
# 9 < 2^9, prefix-free by construction).
PROG_AC_VALS = bytes(
    (r << 4) | sz for r in range(16) for sz in range(11)
)
PROG_AC_BITS = [0] * 8 + [len(PROG_AC_VALS)] + [0] * 7


class _ScanWriter(_BitWriter):
    """_BitWriter plus the progressive-scan bookkeeping: pending EOB run
    and the correction bits buffered with it (T.81 G.1.2.2-3)."""

    def __init__(self, ac_codes):
        super().__init__()
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.be_bits: list[int] = []

    def emit_ac(self, symbol: int) -> None:
        ln, code = self.ac_codes[symbol]
        self.put(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.emit_ac(n << 4)
            if n:
                self.put(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for bit in self.be_bits:
            self.put(bit, 1)
        self.be_bits = []


def _encode_dc_scan(
    blocks_per_comp, comp_idx, sampling, grids, mcux, mcuy, ah, al,
    dc_codes, restart_interval,
):
    """DC scan (first when ah == 0, refinement otherwise), interleaved in
    MCU order over the participating components."""
    out = bytearray()
    w = _BitWriter()
    pred = {c: 0 for c in comp_idx}
    rst = 0
    unit = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and unit and unit % restart_interval == 0:
                out += w.flush()
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = {c: 0 for c in comp_idx}
            for c in comp_idx:
                hs, vs = sampling[c]
                bwb = grids[c][0]
                for by in range(vs):
                    for bx in range(hs):
                        blk = blocks_per_comp[c][
                            (my * vs + by) * bwb + (mx * hs + bx)
                        ]
                        if ah == 0:
                            v = blk[0] >> al  # arithmetic shift per G.1.2.1
                            diff = v - pred[c]
                            pred[c] = v
                            t = _category(diff)
                            ln, code = dc_codes[t]
                            w.put(code, ln)
                            if t:
                                w.put(_magnitude_bits(diff, t), t)
                        else:
                            w.put((blk[0] >> al) & 1, 1)
            unit += 1
    out += w.flush()
    return bytes(out)


def _encode_ac_first_scan(
    blocks, cw, ch, bwb, ss, se, al, ac_codes, restart_interval=0
):
    """AC initial scan (ah == 0): band run-length coding with EOB runs
    spanning blocks; values point-transformed as sign * (|v| >> al).
    Restart markers (DRI counts BLOCKS in non-interleaved scans) flush
    the pending EOB run and realign the bitstream."""
    out = bytearray()
    w = _ScanWriter(ac_codes)
    rst = 0
    unit = 0
    for by in range(ch):
        for bx in range(cw):
            if restart_interval and unit and unit % restart_interval == 0:
                w.flush_eobrun()
                out += w.flush()
                w = _ScanWriter(ac_codes)
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
            unit += 1
            blk = blocks[by * bwb + bx]
            vals = []
            for k in range(ss, se + 1):
                v = blk[ZIGZAG[k]]
                mag = (-v if v < 0 else v) >> al
                vals.append(-mag if v < 0 else mag)
            if not any(vals):
                w.eobrun += 1
                if w.eobrun == 0x7FFF:
                    w.flush_eobrun()
                continue
            w.flush_eobrun()
            r = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i, v in enumerate(vals):
                if i > last_nz:
                    break
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    w.emit_ac(0xF0)
                    r -= 16
                s = _category(v)
                w.emit_ac((r << 4) | s)
                w.put(_magnitude_bits(v, s), s)
                r = 0
            if last_nz < len(vals) - 1:
                w.eobrun = 1  # trailing zeros start a (possibly longer) run
    w.flush_eobrun()
    out += w.flush()
    return bytes(out)


def _encode_ac_refine_scan(
    blocks, cw, ch, bwb, ss, se, al, ac_codes, restart_interval=0
):
    """AC refinement scan (ah == al + 1): newly-significant coefficients
    as run/1 codes + sign bit, correction bits for already-significant
    ones buffered with the code (or EOB run) they travel under, ZRLs
    folded into the EOB run past the last newly-significant coefficient —
    the jcphuff.c structure, independently rebuilt from T.81 figure G.7."""
    out = bytearray()
    w = _ScanWriter(ac_codes)
    rst = 0
    unit = 0
    for by in range(ch):
        for bx in range(cw):
            if restart_interval and unit and unit % restart_interval == 0:
                w.flush_eobrun()
                out += w.flush()
                w = _ScanWriter(ac_codes)
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
            unit += 1
            blk = blocks[by * bwb + bx]
            absv = []
            eob = -1
            for k in range(ss, se + 1):
                v = blk[ZIGZAG[k]]
                t = (-v if v < 0 else v) >> al
                absv.append(t)
                if t == 1:
                    eob = k - ss
            r = 0
            br: list[int] = []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i <= eob:
                    w.flush_eobrun()
                    w.emit_ac(0xF0)
                    r -= 16
                    for bit in br:
                        w.put(bit, 1)
                    br = []
                if t > 1:
                    br.append(t & 1)
                    continue
                w.flush_eobrun()
                w.emit_ac((r << 4) | 1)
                v = blk[ZIGZAG[ss + i]]
                w.put(0 if v < 0 else 1, 1)
                for bit in br:
                    w.put(bit, 1)
                br = []
                r = 0
            if r > 0 or br:
                w.eobrun += 1
                w.be_bits += br
                if w.eobrun == 0x7FFF:
                    w.flush_eobrun()
    w.flush_eobrun()
    out += w.flush()
    return bytes(out)


def encode_progressive_jpeg(
    width: int,
    height: int,
    blocks_per_comp: list[list[list[int]]],
    sampling: list[tuple[int, int]],
    scans: list[tuple[list[int], int, int, int, int]],
    quant: list[int] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Build a progressive (SOF2) JPEG from per-component, per-block
    coefficient lists (NATURAL order, full-precision quantized values,
    blocks in the component's MCU-PADDED RASTER order — the same layout
    the decoder stores). ``scans`` is the scan script: each entry is
    (component indices, Ss, Se, Ah, Al); DC scans may interleave several
    components, AC scans must name exactly one (T.81 G.1.1.1). One shared
    quant table and the Annex-K luminance Huffman tables throughout."""
    q = quant or [16] * 64
    nc = len(blocks_per_comp)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for c in range(nc):
        hs, vs = sampling[c]
        bwb = mcux * hs
        cw = (-(-(width * hs) // hmax) + 7) // 8
        ch = (-(-(height * vs) // vmax) + 7) // 8
        grids.append((bwb, cw, ch))

    seg = bytearray(b"\xff\xd8")
    seg += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0])
    seg += bytes(q[ZIGZAG[k]] for k in range(64))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(nc)
    for c in range(nc):
        hs, vs = sampling[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    seg += b"\xff\xc2" + (2 + len(sof)).to_bytes(2, "big") + sof
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, PROG_AC_BITS, PROG_AC_VALS)):
        dht = bytes([cls << 4]) + bytes(bits) + vals
        seg += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    if restart_interval:
        seg += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")

    dc_codes = _inv(_build_huffman(DC_BITS, DC_VALS))
    ac_codes = _inv(_build_huffman(PROG_AC_BITS, PROG_AC_VALS))

    for comp_idx, ss, se, ah, al in scans:
        sos = bytearray([len(comp_idx)])
        for c in comp_idx:
            sos += bytes([c + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
        if ss == 0:
            seg += _encode_dc_scan(
                blocks_per_comp, comp_idx, sampling, grids, mcux, mcuy,
                ah, al, dc_codes, restart_interval,
            )
        else:
            if len(comp_idx) != 1:
                raise ValueError("progressive AC scans are single-component")
            c = comp_idx[0]
            bwb, cw, ch = grids[c]
            if ah == 0:
                seg += _encode_ac_first_scan(
                    blocks_per_comp[c], cw, ch, bwb, ss, se, al, ac_codes,
                    restart_interval,
                )
            else:
                seg += _encode_ac_refine_scan(
                    blocks_per_comp[c], cw, ch, bwb, ss, se, al, ac_codes,
                    restart_interval,
                )
    return bytes(seg) + b"\xff\xd9"


def encode_jpeg_noninterleaved(
    width: int,
    height: int,
    blocks_per_comp: list[list[list[int]]],
    sampling: list[tuple[int, int]],
    quant: list[int] | None = None,
) -> bytes:
    """Baseline SOF0 file with ONE SOS PER COMPONENT (T.81-legal
    sequential non-interleaved form): each scan codes its component's
    unpadded cw x ch block grid in raster order with an independent DC
    predictor. Blocks are given in MCU-PADDED RASTER order per component
    (the decoder-store layout); padded blocks are skipped."""
    q = quant or [16] * 64
    nc = len(blocks_per_comp)
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)

    seg = bytearray(b"\xff\xd8")
    seg += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0])
    seg += bytes(q[ZIGZAG[k]] for k in range(64))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(nc)
    for c in range(nc):
        hs, vs = sampling[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0])
    seg += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        dht = bytes([cls << 4]) + bytes(bits) + vals
        seg += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht

    dc_codes = _inv(_build_huffman(DC_BITS, DC_VALS))
    ac_codes = _inv(_build_huffman(AC_BITS, AC_VALS))

    for c in range(nc):
        hs, vs = sampling[c]
        bwb = mcux * hs
        cw = (-(-(width * hs) // hmax) + 7) // 8
        ch = (-(-(height * vs) // vmax) + 7) // 8
        sos = bytearray([1, c + 1, 0x00]) + b"\x00\x3f\x00"
        seg += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos
        w = _BitWriter()
        pred = 0
        for by in range(ch):
            for bx in range(cw):
                coef = blocks_per_comp[c][by * bwb + bx]
                diff = coef[0] - pred
                pred = coef[0]
                t = _category(diff)
                ln, code = dc_codes[t]
                w.put(code, ln)
                if t:
                    w.put(_magnitude_bits(diff, t), t)
                run = 0
                for k in range(1, 64):
                    v = coef[ZIGZAG[k]]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[0xF0]
                        w.put(code, ln)
                        run -= 16
                    s = _category(v)
                    ln, code = ac_codes[(run << 4) | s]
                    w.put(code, ln)
                    w.put(_magnitude_bits(v, s), s)
                    run = 0
                if run:
                    ln, code = ac_codes[0x00]
                    w.put(code, ln)
        seg += w.flush()
    return bytes(seg) + b"\xff\xd9"
