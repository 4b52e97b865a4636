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
