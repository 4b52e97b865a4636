"""Baseline-JPEG decoder tests: analytic goldens + numpy differential.

The encoder (tests/jpeg_golden.py) assembles spec-conformant files from
explicit coefficient lists; the decoder must reproduce (a) analytically
known pixel values for DC-only blocks (IDCT of a DC-only block is the
constant DC/8 + 128), (b) a numpy-computed reference IDCT for AC
patterns, (c) DC prediction across blocks, restart-marker resets, and
4:2:0 chroma upsampling + YCbCr→RGB.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from jpeg_golden import encode_jpeg
from open_ftth_relational_projector_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg_pixels,
)


def _dc_block(dc: int) -> list[int]:
    b = [0] * 64
    b[0] = dc
    return b


def test_constant_gray_dc_only():
    # q=16, quantized DC=4 → dequant 64 → IDCT constant 64/8=8 → 136
    jp = encode_jpeg(8, 8, [[_dc_block(4)]], [(1, 1)])
    w, h, px = decode_jpeg_pixels(jp)
    assert (w, h) == (8, 8)
    assert set(px) == {136}
    assert len(px) == 8 * 8 * 3


def test_dc_prediction_across_blocks():
    jp = encode_jpeg(16, 8, [[_dc_block(4), _dc_block(10)]], [(1, 1)])
    w, h, px = decode_jpeg_pixels(jp)
    assert (w, h) == (16, 8)
    a = np.frombuffer(px, np.uint8).reshape(8, 16, 3)
    assert set(a[:, :8].flat) == {136}
    assert set(a[:, 8:].flat) == {148}  # 2*10+128


def _ref_idct(coef_natural: list[int], q: int = 16) -> np.ndarray:
    """Independent float IDCT: T.81 A.3.3 with half-up rounding."""
    S = np.array(coef_natural, float).reshape(8, 8) * q
    C = np.array([1 / math.sqrt(2)] + [1.0] * 7)
    x = np.arange(8)
    cos = np.cos((2 * x[:, None] + 1) * x[None, :] * math.pi / 16)  # [x, u]
    out = np.zeros((8, 8))
    for yy in range(8):
        for xx in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    s += C[u] * C[v] * S[v, u] * cos[xx, u] * cos[yy, v]
            out[yy, xx] = math.floor(s / 4 + 128 + 0.5)
    return np.clip(out, 0, 255).astype(np.uint8)


def test_ac_coefficients_match_numpy_reference():
    rng = np.random.default_rng(7)
    coef = [0] * 64
    coef[0] = 3
    coef[1] = -5  # (u=1, v=0)
    coef[8] = 2  # (u=0, v=1)
    coef[27] = 7  # mid-frequency
    coef[63] = -2  # highest frequency — exercises long zero runs + ZRL
    jp = encode_jpeg(8, 8, [[coef]], [(1, 1)])
    w, h, px = decode_jpeg_pixels(jp)
    got = np.frombuffer(px, np.uint8).reshape(8, 8, 3)[:, :, 0]
    want = _ref_idct(coef)
    np.testing.assert_array_equal(got, want)
    # random dense block too
    coef2 = [int(v) for v in rng.integers(-9, 10, 64)]
    jp2 = encode_jpeg(8, 8, [[coef2]], [(1, 1)])
    _, _, px2 = decode_jpeg_pixels(jp2)
    got2 = np.frombuffer(px2, np.uint8).reshape(8, 8, 3)[:, :, 0]
    np.testing.assert_array_equal(got2, _ref_idct(coef2))


def test_restart_interval_resets_dc_prediction():
    # restart_interval=1: each MCU encodes DC as diff from 0
    jp = encode_jpeg(
        16, 8, [[_dc_block(4), _dc_block(10)]], [(1, 1)], restart_interval=1
    )
    w, h, px = decode_jpeg_pixels(jp)
    a = np.frombuffer(px, np.uint8).reshape(8, 16, 3)
    assert set(a[:, :8].flat) == {136}
    assert set(a[:, 8:].flat) == {148}


def test_color_420_constant_and_upsampling():
    # 16x16 4:2:0 — four Y blocks DC=4 (Y = 2*4+128 = 136), one Cb block
    # DC=2 (Cb = 132), one Cr block DC=-3 (Cr = 122)
    y_blocks = [_dc_block(4)] * 4
    jp = encode_jpeg(
        16,
        16,
        [y_blocks, [_dc_block(2)], [_dc_block(-3)]],
        [(2, 2), (1, 1), (1, 1)],
    )
    w, h, px = decode_jpeg_pixels(jp)
    assert (w, h) == (16, 16)
    a = np.frombuffer(px, np.uint8).reshape(16, 16, 3)
    import math as _m

    r = _m.floor(136 + 1.402 * (122 - 128) + 0.5)
    g = _m.floor(136 - 0.344136 * (132 - 128) - 0.714136 * (122 - 128) + 0.5)
    b = _m.floor(136 + 1.772 * (132 - 128) + 0.5)
    assert set(a[:, :, 0].flat) == {r}
    assert set(a[:, :, 1].flat) == {g}
    assert set(a[:, :, 2].flat) == {b}


def test_non_baseline_features_raise():
    # progressive (SOF2) is SUPPORTED since round 5; the remaining
    # boundaries are arithmetic/lossless/hierarchical coding
    jp = bytearray(encode_jpeg(8, 8, [[_dc_block(4)]], [(1, 1)]))
    i = jp.find(b"\xff\xc0")
    jp[i + 1] = 0xC9  # rewrite SOF0 → SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(bytes(jp))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_pixels(b"\x00\x01")


def test_resize_images_real_handles_jpeg(spark):
    """End-to-end through the Spark mapInPandas path: JPEG payload in,
    PNG re-encode out, stable golden sha + true source dims."""
    import hashlib

    from open_ftth_relational_projector_spark.functions.jpeg import (
        decode_jpeg_pixels as dec,
    )
    from open_ftth_relational_projector_spark.functions.multimodal import (
        encode_png,
        resize_images,
        resize_nearest,
    )

    jp = encode_jpeg(16, 8, [[_dc_block(4), _dc_block(10)]], [(1, 1)])
    df = spark.createDataFrame([(1, bytearray(jp))], "doc_id long, payload binary")
    out = resize_images(df, target_w=4, target_h=4, fake=False).collect()
    assert len(out) == 1
    row = out[0]
    assert (row.width, row.height) == (16, 8)
    w, h, px = dec(jp)
    want = hashlib.sha256(
        encode_png(resize_nearest(px, w, h, 3, 4, 4), 4, 4, 2)
    ).hexdigest()
    assert row.resized_sha256 == want


# --- property-based coverage (Spark-free, pure decode) ----------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(-20, 20), min_size=64, max_size=64),
            min_size=1,
            max_size=4,
        )
    )
    def test_any_gray_blocks_roundtrip_vs_reference(blocks):
        """Arbitrary quantized coefficient blocks (1-4 blocks wide, 8 px
        tall) survive encode→decode bit-exactly vs the numpy reference
        IDCT — Huffman coding, run-lengths, ZRL, and DC prediction all
        exercised by the random coefficient structure."""
        n = len(blocks)
        jp = encode_jpeg(8 * n, 8, [blocks], [(1, 1)])
        w, h, px = decode_jpeg_pixels(jp)
        assert (w, h) == (8 * n, 8)
        a = np.frombuffer(px, np.uint8).reshape(8, 8 * n, 3)[:, :, 0]
        for i, blk in enumerate(blocks):
            np.testing.assert_array_equal(
                a[:, 8 * i : 8 * (i + 1)], _ref_idct(blk)
            )

    @settings(max_examples=10, deadline=None)
    @given(
        st.integers(-30, 30),
        st.integers(-30, 30),
        st.integers(-30, 30),
        st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
    )
    def test_color_constant_any_sampling(ydc, bdc, rdc, samp):
        """Constant-color images under every legal luma sampling layout:
        the decoded RGB must equal the JFIF matrix applied to the three
        DC-only planes, for 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 alike."""
        hs, vs = samp
        y_blocks = [_dc_block(ydc)] * (hs * vs)
        jp = encode_jpeg(
            8 * hs,
            8 * vs,
            [y_blocks, [_dc_block(bdc)], [_dc_block(rdc)]],
            [(hs, vs), (1, 1), (1, 1)],
        )
        w, h, px = decode_jpeg_pixels(jp)
        assert (w, h) == (8 * hs, 8 * vs)
        yv = max(0, min(255, 2 * ydc + 128))
        bv = max(0, min(255, 2 * bdc + 128))
        rv = max(0, min(255, 2 * rdc + 128))
        want = (
            math.floor(max(0.0, min(255.0, yv + 1.402 * (rv - 128))) + 0.5),
            math.floor(
                max(
                    0.0,
                    min(
                        255.0,
                        yv - 0.344136 * (bv - 128) - 0.714136 * (rv - 128),
                    ),
                )
                + 0.5
            ),
            math.floor(max(0.0, min(255.0, yv + 1.772 * (bv - 128))) + 0.5),
        )
        a = np.frombuffer(px, np.uint8).reshape(h, w, 3)
        assert set(a[:, :, 0].flat) == {want[0]}
        assert set(a[:, :, 1].flat) == {want[1]}
        assert set(a[:, :, 2].flat) == {want[2]}


def test_header_sniffer_agrees_with_pixel_decoder():
    """multimodal.decode_image's JPEG dimension sniffing must agree with
    the full pixel decoder on encoder-built files (SOF0 parse parity)."""
    from open_ftth_relational_projector_spark.functions.multimodal import (
        decode_image,
    )

    for w_blocks, h_blocks in ((1, 1), (3, 1)):
        blocks = [[_dc_block(4)] * (w_blocks * h_blocks)]
        jp = encode_jpeg(8 * w_blocks, 8 * h_blocks, blocks, [(1, 1)])
        assert decode_image(jp) == (8 * w_blocks, 8 * h_blocks)
        w, h, _ = decode_jpeg_pixels(jp)
        assert (w, h) == decode_image(jp)


def test_truncated_entropy_stream_raises():
    jp = encode_jpeg(8, 8, [[_dc_block(4)]], [(1, 1)])
    # cut inside the entropy-coded data (before EOI)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(jp[: len(jp) - 4] )


# --------------------------------------------------------------------------
# Progressive (SOF2) — differential vs the baseline path on identical
# coefficients: both encoders serialize the SAME quantized blocks, so the
# decoded pixels must be bit-identical however the scans are split.
# --------------------------------------------------------------------------

from jpeg_golden import encode_progressive_jpeg  # noqa: E402


def _rand_blocks(rng, n, lo=-9, hi=10, dc_hi=40):
    out = []
    for _ in range(n):
        b = [int(v) for v in rng.integers(lo, hi, 64)]
        b[0] = int(rng.integers(-dc_hi, dc_hi))
        out.append(b)
    return out


def _mcu_order(blocks, bwb, bhb, hs, vs):
    """Reorder a raster block grid into baseline-encoder MCU traversal."""
    out = []
    for my in range(bhb // vs):
        for mx in range(bwb // hs):
            for by in range(vs):
                for bx in range(hs):
                    out.append(blocks[(my * vs + by) * bwb + (mx * hs + bx)])
    return out


def test_progressive_spectral_selection_equals_baseline():
    rng = np.random.default_rng(11)
    blocks = _rand_blocks(rng, 4)  # 32x16 gray, 4 blocks (raster 4x1... 2x2)
    base = encode_jpeg(16, 16, [blocks], [(1, 1)])
    prog = encode_progressive_jpeg(
        16,
        16,
        [blocks],
        [(1, 1)],
        scans=[
            ([0], 0, 0, 0, 0),  # DC first
            ([0], 1, 5, 0, 0),  # low AC band
            ([0], 6, 63, 0, 0),  # rest
        ],
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_successive_approximation_equals_baseline():
    """DC + AC successive approximation (Al=1 first pass, refinement to
    Al=0): exercises newly-significant ±1 coefficients, correction bits
    on already-significant ones, and odd/even DC values."""
    rng = np.random.default_rng(23)
    blocks = _rand_blocks(rng, 4, lo=-3, hi=4)  # small values: many ±1
    # make sure specific shapes exist: odd DC, even DC, a lone |1| high-freq
    blocks[0][0] = 7
    blocks[1][0] = -6
    blocks[2][63] = 1
    blocks[3][63] = -1
    base = encode_jpeg(16, 16, [blocks], [(1, 1)])
    prog = encode_progressive_jpeg(
        16,
        16,
        [blocks],
        [(1, 1)],
        scans=[
            ([0], 0, 0, 0, 1),  # DC at reduced precision
            ([0], 1, 63, 0, 1),  # AC at reduced precision
            ([0], 0, 0, 1, 0),  # DC refinement
            ([0], 1, 63, 1, 0),  # AC refinement
        ],
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_sparse_blocks_eob_runs():
    """Mostly-empty AC bands across many blocks: EOB runs > 1 (EOBn codes
    with appended run-length bits) and, in the refinement scan, EOB runs
    carrying buffered correction bits."""
    blocks = [[0] * 64 for _ in range(8)]  # 64x8 gray, 8 blocks in a row
    for i, b in enumerate(blocks):
        b[0] = 3 * i - 10
    blocks[0][5] = 2   # AC only in first and last blocks: 6-block EOB run
    blocks[7][40] = -3
    blocks[3][63] = 1  # invisible at Al=1, newly significant on refine
    base = encode_jpeg(64, 8, [blocks], [(1, 1)])
    for scans in (
        [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],  # spectral only
        [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ],  # with refinement
    ):
        prog = encode_progressive_jpeg(64, 8, [blocks], [(1, 1)], scans=scans)
        assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base), scans


def test_progressive_color_420_interleaved_dc():
    """3-component 4:2:0: the DC scan interleaves all components in MCU
    order; AC scans are per-component over the unpadded block grid."""
    rng = np.random.default_rng(31)
    # 32x16 image, 2x2 luma sampling: luma grid 4x2 raster, chroma 2x1
    luma = _rand_blocks(rng, 8, lo=-4, hi=5)
    cb = _rand_blocks(rng, 2, lo=-3, hi=4)
    cr = _rand_blocks(rng, 2, lo=-3, hi=4)
    samp = [(2, 2), (1, 1), (1, 1)]
    base = encode_jpeg(
        32,
        16,
        [_mcu_order(luma, 4, 2, 2, 2), cb, cr],
        samp,
    )
    prog = encode_progressive_jpeg(
        32,
        16,
        [luma, cb, cr],
        samp,
        scans=[
            ([0, 1, 2], 0, 0, 0, 0),  # interleaved DC
            ([0], 1, 63, 0, 0),
            ([1], 1, 63, 0, 0),
            ([2], 1, 63, 0, 0),
        ],
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_restart_in_dc_scan():
    rng = np.random.default_rng(41)
    blocks = _rand_blocks(rng, 4)
    base = encode_jpeg(32, 8, [blocks], [(1, 1)])  # 4 MCUs in a row
    prog = encode_progressive_jpeg(
        32,
        8,
        [blocks],
        [(1, 1)],
        scans=[([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
        restart_interval=2,
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_progressive_truncated_raises():
    blocks = [[0] * 64 for _ in range(2)]
    blocks[0][0] = 9
    blocks[1][27] = 5
    prog = encode_progressive_jpeg(
        16, 8, [blocks], [(1, 1)],
        scans=[([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
    )
    with pytest.raises(ValueError):
        decode_jpeg_pixels(prog[: len(prog) - 6])


def test_progressive_multilevel_refinement_random():
    """Three-level successive approximation (Al=2 first, two refinement
    passes) on random blocks, gray and 4:2:2 color: decoded pixels must
    equal the baseline encoding of the same coefficients at every seed."""
    for seed in (3, 17, 59, 101):
        rng = np.random.default_rng(seed)
        blocks = _rand_blocks(rng, 4, lo=-12, hi=13)
        base = encode_jpeg(16, 16, [blocks], [(1, 1)])
        prog = encode_progressive_jpeg(
            16,
            16,
            [blocks],
            [(1, 1)],
            scans=[
                ([0], 0, 0, 0, 2),
                ([0], 1, 20, 0, 2),
                ([0], 21, 63, 0, 2),
                ([0], 0, 0, 1, 1),
                ([0], 1, 20, 1, 1),
                ([0], 21, 63, 1, 1),
                ([0], 0, 0, 1, 0),
                ([0], 1, 20, 1, 0),
                ([0], 21, 63, 1, 0),
            ],
        )
        assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base), seed

    rng = np.random.default_rng(77)
    luma = _rand_blocks(rng, 4, lo=-6, hi=7)  # 4:2:2 — 16x16, luma 2x2... 2x1
    cb = _rand_blocks(rng, 2, lo=-4, hi=5)
    cr = _rand_blocks(rng, 2, lo=-4, hi=5)
    samp = [(2, 1), (1, 1), (1, 1)]
    base = encode_jpeg(32, 8, [_mcu_order(luma, 4, 1, 2, 1), cb, cr], samp)
    prog = encode_progressive_jpeg(
        32,
        8,
        [luma, cb, cr],
        samp,
        scans=[
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([2], 1, 63, 0, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([2], 1, 63, 1, 0),
        ],
    )
    assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


if _HAVE_HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(-20, 20), min_size=64, max_size=64),
            min_size=1,
            max_size=6,
        ),
        st.integers(1, 62),
        st.integers(0, 2),
    )
    def test_progressive_any_blocks_any_scan_split(blocks, split, al):
        """Arbitrary blocks under an arbitrary spectral split point and
        successive-approximation depth must decode bit-identically to the
        baseline encoding of the same coefficients: the scan script
        carries the DC scan, two AC bands split at `split`, and — for
        al > 0 — a full refinement ladder down to Al=0."""
        n = len(blocks)
        scans = [([0], 0, 0, 0, al)]
        scans += [([0], 1, split, 0, al), ([0], split + 1, 63, 0, al)]
        for level in range(al, 0, -1):
            scans += [
                ([0], 0, 0, level, level - 1),
                ([0], 1, split, level, level - 1),
                ([0], split + 1, 63, level, level - 1),
            ]
        base = encode_jpeg(8 * n, 8, [blocks], [(1, 1)])
        prog = encode_progressive_jpeg(
            8 * n, 8, [blocks], [(1, 1)], scans=scans
        )
        assert decode_jpeg_pixels(prog) == decode_jpeg_pixels(base)


def test_baseline_noninterleaved_per_component_scans():
    """T.81-legal sequential 4:2:0 file with one SOS per component (the
    shape the round-5 review flagged as misdecoded): must equal the
    interleaved encoding of the same coefficients. The padded luma blocks
    outside the unpadded cw x ch grid are never coded in this form, so
    they are zeroed for the interleaved reference too."""
    from jpeg_golden import encode_jpeg_noninterleaved

    rng = np.random.default_rng(53)
    luma = _rand_blocks(rng, 4, lo=-5, hi=6)  # 16x16, 2x2 grid, all coded
    cb = _rand_blocks(rng, 1, lo=-4, hi=5)
    cr = _rand_blocks(rng, 1, lo=-4, hi=5)
    samp = [(2, 2), (1, 1), (1, 1)]
    non = encode_jpeg_noninterleaved(16, 16, [luma, cb, cr], samp)
    base = encode_jpeg(16, 16, [_mcu_order(luma, 2, 2, 2, 2), cb, cr], samp)
    assert decode_jpeg_pixels(non) == decode_jpeg_pixels(base)


def test_fill_bytes_before_markers():
    """Optional 0xFF fill bytes before a marker (T.81 B.1.1.2) must be
    skipped — both in the pre-scan header region and between the scans of
    a progressive file."""
    rng = np.random.default_rng(61)
    blocks = _rand_blocks(rng, 2)
    base = encode_jpeg(16, 8, [blocks], [(1, 1)])
    padded = base.replace(b"\xff\xc0", b"\xff\xff\xff\xc0", 1)
    assert decode_jpeg_pixels(padded) == decode_jpeg_pixels(base)

    prog = encode_progressive_jpeg(
        16, 8, [blocks], [(1, 1)],
        scans=[([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
    )
    # pad the SECOND SOS (between scans — the newly reachable region)
    i = prog.find(b"\xff\xda", prog.find(b"\xff\xda") + 2)
    padded = prog[:i] + b"\xff" + prog[i:]
    assert decode_jpeg_pixels(padded) == decode_jpeg_pixels(prog)


def test_interleaved_progressive_ac_scan_raises():
    """A malformed SOF2 file whose AC scan lists multiple components must
    raise, not silently skip the scan (round-5 review finding)."""
    blocks = [[0] * 64 for _ in range(1)]
    blocks[0][0] = 5
    prog = bytearray(
        encode_progressive_jpeg(
            8, 8, [blocks], [(1, 1)],
            scans=[([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
        )
    )
    # rewrite the second SOS header to claim ns=... can't add comps to a
    # 1-comp file; build a 3-comp file and corrupt its luma AC scan into
    # an "interleaved" one by bumping ns and appending a comp spec
    luma = [[0] * 64 for _ in range(1)]
    cb = [[0] * 64 for _ in range(1)]
    cr = [[0] * 64 for _ in range(1)]
    luma[0][0] = 4
    prog = encode_progressive_jpeg(
        8, 8, [luma, cb, cr], [(1, 1), (1, 1), (1, 1)],
        scans=[([0, 1, 2], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
    )
    i = prog.find(b"\xff\xda", prog.find(b"\xff\xda") + 2)
    # original scan header: len=8, ns=1, (comp 1, tables), Ss=1, Se=63, AhAl
    # corrupt: ns=2 with comps 1 and 2 → len=10
    old = prog[i : i + 2 + 8]
    assert old[4] == 1  # ns
    new = bytes([0xFF, 0xDA, 0x00, 0x0A, 0x02, 0x01, 0x00, 0x02, 0x00]) + old[-3:]
    corrupted = prog[:i] + new + prog[i + len(old):]
    with pytest.raises(ValueError, match="interleaved progressive AC"):
        decode_jpeg_pixels(corrupted)
