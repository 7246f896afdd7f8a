"""HEVC Main-profile codec (gorillaspark.operators.h265).

Pinning levels, mirroring the H.264 suites:
1. syntax-layer round-trips (VPS/SPS/PPS/slice header, hvcC record,
   hvc1 sample framing);
2. pixel contracts: lossless (cu_transquant_bypass) streams round-trip
   bit-exactly, and lossy decode equals the ENCODER's own
   reconstruction for every intra mode / partitioning / QP sampled —
   the decoder is the encoder's only conformance anchor (no HEVC
   conformance vectors in this sandbox, see the module's honesty
   contract);
3. the ingestion contract: foreign (unmarked) HEVC rejects loudly,
   truncation/corruption surfaces as ValueError/NotImplementedError,
   never an internal exception type.
"""

import random

import numpy as np
import pytest

from gorillaspark.operators import h265 as h5
from gorillaspark.operators.h264 import _Bits, _BitW

RNG = np.random.default_rng(0xC0DEC)


# ---------------------------------------------------------------------------
# syntax layer
# ---------------------------------------------------------------------------


def test_parameter_set_roundtrip():
    bw = _BitW()
    h5._write_vps(bw)
    vps = h5._parse_vps(_Bits(bw.bytes()))
    assert vps["ptl"]["profile_idc"] == 1          # Main

    bw = _BitW()
    h5._write_sps(bw, 64, 32, crop=(0, 4, 0, 2))
    sps = h5._parse_sps(_Bits(bw.bytes()))
    assert (sps["w"], sps["h"]) == (64, 32)
    assert sps["crop"] == (0, 4, 0, 2)
    assert sps["log2_ctb"] == 4 and sps["log2_min_cb"] == 3

    bw = _BitW()
    h5._write_pps(bw, qp=30, deblock=True)
    pps = h5._parse_pps(_Bits(bw.bytes()))
    assert pps == {"qp": 30, "tq_bypass": 0, "deblock": 1}

    bw = _BitW()
    h5._write_pps(bw, qp=37, transquant_bypass=True)
    pps = h5._parse_pps(_Bits(bw.bytes()))
    assert pps == {"qp": 37, "tq_bypass": 1, "deblock": 0}

    bw = _BitW()
    h5._write_slice_header(bw, qp_delta=-3)
    sh = h5._parse_slice_header(_Bits(bw.bytes() + b"\xff"), pps)
    assert sh["qp"] == 34


def test_nal_layer_two_byte_header():
    stream = h5._nal(h5._NAL_VPS, b"\x01\x00\x00\x00\x02") \
        + h5._marker_sei()
    nals = list(h5._split_annexb_h265(stream))
    assert nals[0][0] == h5._NAL_VPS
    assert nals[0][3] == b"\x01\x00\x00\x00\x02"   # unescaped exactly
    assert nals[1][0] == h5._NAL_PREFIX_SEI
    assert h5._GS_HEVC_UUID in nals[1][3]


def test_hvcc_record_and_sample_roundtrip():
    y = RNG.integers(0, 256, (16, 32), dtype=np.uint8)
    annexb = h5.h265_encode(y, lossless=True)
    hvcc = h5.hevc_hvcc_config(annexb)
    assert hvcc[0] == 1 and (hvcc[21] & 3) == 3    # 4-byte lengths
    sample = h5.hevc_to_hvc1_sample(annexb)
    rebuilt = h5.hevc_sample_to_annexb(sample, hvcc)
    Y, _, _, _ = h5.h265_decode_planes(rebuilt)
    assert (Y == y).all()


def test_dct_matrices_match_published_values():
    # the recursive even-row fold must reproduce the spec's literal
    # matrices (spot-pinned against the universally published rows)
    assert h5._DCT[4].tolist() == [[64, 64, 64, 64],
                                   [83, 36, -36, -83],
                                   [64, -64, -64, 64],
                                   [36, -83, 83, -36]]
    assert h5._DCT[8][1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert h5._DCT[16][1].tolist() == [90, 87, 80, 70, 57, 43, 25, 9,
                                       -9, -25, -43, -57, -70, -80,
                                       -87, -90]


# ---------------------------------------------------------------------------
# pixel contracts
# ---------------------------------------------------------------------------


def test_lossless_roundtrip_random_planes():
    y = RNG.integers(0, 256, (32, 48), dtype=np.uint8)
    cb = RNG.integers(0, 256, (16, 24), dtype=np.uint8)
    cr = RNG.integers(0, 256, (16, 24), dtype=np.uint8)
    p = h5.h265_encode(y, cb=cb, cr=cr, lossless=True)
    Y, Cb, Cr, crop = h5.h265_decode_planes(p)
    assert crop == (0, 0, 0, 0)
    assert (Y == y).all() and (Cb == cb).all() and (Cr == cr).all()


def test_lossless_conformance_window():
    y = RNG.integers(0, 256, (22, 36), dtype=np.uint8)
    p = h5.h265_encode(y, lossless=True)
    rgb = h5.h265_decode(p)
    assert rgb.shape == (22, 36, 3)
    # neutral chroma -> exact grey equal to the luma plane
    assert (rgb[:, :, 0].astype(np.int64) == y).all()
    assert (rgb[:, :, 0] == rgb[:, :, 1]).all()


def test_lossy_decode_equals_encoder_reconstruction():
    y = RNG.integers(0, 256, (48, 64), dtype=np.uint8)
    for qp in (12, 30, 45):
        p = h5.h265_encode(y, qp=qp)
        Y, Cb, Cr, _ = h5.h265_decode_planes(p)
        Yr, Cbr, Crr, _ = h5.h265_encoder_reconstruction(y, qp=qp)
        assert (Y == Yr).all() and (Cb == Cbr).all() and (Cr == Crr).all()


@pytest.mark.parametrize("mode", list(range(35)))
def test_every_intra_mode_round_trips(mode):
    y = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    for force_split in (None, True):
        p = h5.h265_encode(y, qp=28, cands=(mode,),
                           force_split=force_split)
        Y, _, _, _ = h5.h265_decode_planes(p)
        Yr, _, _, _ = h5.h265_encoder_reconstruction(
            y, qp=28, cands=(mode,), force_split=force_split)
        assert (Y == Yr).all(), f"mode {mode} split={force_split}"


def test_quadtree_and_nxn_paths():
    # a sharp quadrant image makes the auto heuristic split and the
    # 4x4 detail makes NxN win inside at least some 8x8 CUs
    y = np.zeros((32, 32), dtype=np.uint8)
    y[:16, :16] = 240
    y[16:, 16:] = 120
    y[::2, ::2] ^= 60
    p_auto = h5.h265_encode(y, qp=24)
    p_flat = h5.h265_encode(y, qp=24, force_split=False)
    Y_a, _, _, _ = h5.h265_decode_planes(p_auto)
    Y_f, _, _, _ = h5.h265_decode_planes(p_flat)
    Yr_a, _, _, _ = h5.h265_encoder_reconstruction(y, qp=24)
    Yr_f, _, _, _ = h5.h265_encoder_reconstruction(y, qp=24,
                                                   force_split=False)
    assert (Y_a == Yr_a).all() and (Y_f == Yr_f).all()


def test_lossy_quality_sane():
    xg, yg = np.meshgrid(np.arange(64), np.arange(32))
    y = ((xg * 2 + yg * 3) % 256).astype(np.uint8)
    p = h5.h265_encode(y, qp=22)
    Y, _, _, _ = h5.h265_decode_planes(p)
    assert float(np.abs(Y[:32, :64] - y).mean()) < 4.0
    assert len(p) < y.size // 4          # actually compresses


def test_intra_only_gop():
    frames = [RNG.integers(0, 256, (16, 16), dtype=np.uint8)
              for _ in range(3)]
    payload = b"".join(h5.h265_encode(f, lossless=True) for f in frames)
    out = h5.h265_decode_gop(payload)
    assert len(out) == 3
    for g, f in zip(out, frames):
        assert (g[:, :, 0].astype(np.int64) == f).all()


def test_lossless_fuzz_roundtrip():
    for trial in range(6):
        h = int(RNG.integers(1, 4)) * 16
        w = int(RNG.integers(1, 4)) * 16
        y = RNG.integers(0, 256, (h, w), dtype=np.uint8)
        cb = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        cr = RNG.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)
        fs = [None, True, False][trial % 3]
        p = h5.h265_encode(y, cb=cb, cr=cr, lossless=True,
                           force_split=fs)
        Y, Cb, Cr, _ = h5.h265_decode_planes(p)
        assert (Y == y).all() and (Cb == cb).all() and (Cr == cr).all()


def test_lossy_fuzz_parity():
    for trial in range(6):
        y = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
        qp = int(RNG.integers(4, 50))
        p = h5.h265_encode(y, qp=qp)
        Y, Cb, Cr, _ = h5.h265_decode_planes(p)
        Yr, Cbr, Crr, _ = h5.h265_encoder_reconstruction(y, qp=qp)
        assert (Y == Yr).all() and (Cb == Cbr).all() and (Cr == Crr).all()


# ---------------------------------------------------------------------------
# ingestion contract
# ---------------------------------------------------------------------------


def test_foreign_hevc_rejected_loudly():
    y = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    ab = h5.h265_encode(y, lossless=True)
    stripped = b"".join(
        h5._nal(t, rbsp)
        for t, _l, _ti, rbsp in h5._split_annexb_h265(ab)
        if t != h5._NAL_PREFIX_SEI)
    with pytest.raises(NotImplementedError, match="third-party"):
        h5.h265_decode_planes(stripped)


def test_trail_first_stream_rejected():
    # TRAIL NALs are decodable since the r8 P-slice work, but a
    # stream that does not start with an IDR has no reference chain
    y = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    ab = h5.h265_encode(y, lossless=True)
    parts = []
    for t, _l, ti, rbsp in h5._split_annexb_h265(ab):
        parts.append(h5._nal(1 if t == h5._NAL_IDR_W_RADL else t,
                             rbsp, tid=ti))
    with pytest.raises(ValueError, match="IDR"):
        h5.h265_decode_planes(b"".join(parts))


def test_cra_nal_rejected():
    y = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    ab = h5.h265_encode(y, lossless=True)
    parts = []
    for t, _l, ti, rbsp in h5._split_annexb_h265(ab):
        parts.append(h5._nal(21 if t == h5._NAL_IDR_W_RADL else t,
                             rbsp, tid=ti))      # 21 = CRA_NUT
    with pytest.raises(NotImplementedError):
        h5.h265_decode_planes(b"".join(parts))


def test_truncation_and_corruption_contract():
    y = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    base = h5.h265_encode(y, qp=30)
    with pytest.raises((ValueError, NotImplementedError)):
        h5.h265_decode_planes(base[:len(base) // 2])
    rnd = random.Random(11)
    for _ in range(120):
        b = bytearray(base)
        for _ in range(rnd.randint(1, 4)):
            b[rnd.randrange(len(b))] = rnd.randrange(256)
        try:
            h5.h265_decode_planes(bytes(b))
        except (ValueError, NotImplementedError):
            pass           # loud rejection is the contract
        # any other exception type fails the test by propagating


def test_even_dimension_requirement():
    with pytest.raises(ValueError, match="even"):
        h5.h265_encode(np.zeros((15, 16), dtype=np.uint8))


# ---------------------------------------------------------------------------
# P slices (r8): merge/AMVP, partitions, fractional-sample MC
# ---------------------------------------------------------------------------


def _neutral(h, w):
    return np.full((h // 2, w // 2), 128, dtype=np.uint8)


def test_p_gop_lossless_exact():
    rng = np.random.default_rng(41)
    f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    f1 = np.roll(f0, 4, axis=1)                 # pure translation
    f2 = np.roll(f1, (2, -3), axis=(0, 1))
    stream = h5.h265_encode_gop([f0, f1, f2], lossless=True)
    frames, crop = h5.h265_decode_gop_planes(stream)
    assert crop == (0, 0, 0, 0) and len(frames) == 3
    for src, (Y, _cb, _cr) in zip((f0, f1, f2), frames):
        assert np.array_equal(Y, src.astype(np.int64))


def test_p_gop_lossy_decode_equals_encoder_reconstruction():
    rng = np.random.default_rng(42)
    for h, w in ((32, 48), (30, 42)):           # second: crop path
        frames = []
        cur = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(
            np.int64)
        frames.append(cur.copy())
        for _ in range(3):
            dx, dy = int(rng.integers(-6, 7)), int(rng.integers(-6, 7))
            cur = np.roll(cur, (dy, dx), axis=(0, 1))
            cur = np.clip(cur + rng.integers(-3, 4, (h, w)), 0, 255)
            frames.append(cur.copy())
        for qp in (22, 34):
            recon = []
            stream = h5.h265_encode_gop_planes(
                [(f, _neutral(h + h % 2, w + w % 2)[: (h + 1) // 2,
                                                   : (w + 1) // 2],
                  _neutral(h + h % 2, w + w % 2)[: (h + 1) // 2,
                                                 : (w + 1) // 2])
                 for f in frames],
                qp=qp, recon_out=recon)
            dec, _crop = h5.h265_decode_gop_planes(stream)
            assert len(dec) == len(recon)
            for (ry, rcb, rcr), (dy_, dcb, dcr) in zip(recon, dec):
                assert np.array_equal(ry, dy_)
                assert np.array_equal(rcb, dcb)
                assert np.array_equal(rcr, dcr)


def test_p_cu_modes_all_exercised():
    # split-motion content must produce skip, 2Nx2N, 2NxN, Nx2N,
    # merge, AMVP and intra-in-P CUs — and still decode bit-exactly
    stats = {"skip": 0, "2Nx2N": 0, "2NxN": 0, "Nx2N": 0,
             "intra": 0, "merge": 0, "amvp": 0}
    orig = h5._commit_cu_p

    def spy(*a, **k):
        plan = orig(*a, **k)
        if not plan.get("inter"):
            stats["intra"] += 1
        elif plan["skip"]:
            stats["skip"] += 1
        else:
            stats[plan["part"]] = stats.get(plan["part"], 0) + 1
            for syn in plan["pus"]:
                stats[syn[0]] += 1
        return plan

    rng = np.random.default_rng(3)
    h, w = 48, 64
    base = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.int64)
    f1 = base.copy()
    f1[:24] = np.roll(base[:24], 3, axis=1)
    f1[24:] = np.roll(base[24:], -5, axis=1)
    f2 = f1.copy()
    f2[:, :32] = np.roll(f1[:, :32], 4, axis=0)
    f3 = f2.copy()                               # static -> skips
    f4 = np.clip((f2 + np.roll(f2, 1, axis=1)) // 2
                 + rng.integers(-2, 3, (h, w)), 0, 255)
    # f5: fresh smooth content MC cannot predict from the noisy f4 —
    # forces intra-in-P (angular/DC beats any motion candidate)
    xg, yg = np.meshgrid(np.arange(w), np.arange(h))
    f5 = ((xg * 2 + yg) % 256).astype(np.int64)
    h5._commit_cu_p = spy
    try:
        recon = []
        stream = h5.h265_encode_gop_planes(
            [(f, _neutral(h, w), _neutral(h, w))
             for f in (base, f1, f2, f3, f4, f5)], qp=28,
            recon_out=recon)
    finally:
        h5._commit_cu_p = orig
    dec, _ = h5.h265_decode_gop_planes(stream)
    for (ry, rcb, rcr), (dy_, dcb, dcr) in zip(recon, dec):
        assert np.array_equal(ry, dy_)
        assert np.array_equal(rcb, dcb)
        assert np.array_equal(rcr, dcr)
    for k, v in stats.items():
        assert v > 0, f"CU kind {k} never exercised"


def _mc_ref_naive(ref, x0, y0, w, h, mvx, mvy, taps, filt, frac_bits):
    """Literal §8.5.4.2.2 per-pixel reference: clamp-index gather,
    horizontal filter (shift1 = 0), vertical filter (>> 6 when both
    fractions set), << 6 chains for the pure cases, then the
    uni-prediction (+32) >> 6 finalization."""
    H, W = ref.shape
    ix, iy = x0 + (mvx >> frac_bits), y0 + (mvy >> frac_bits)
    mask = (1 << frac_bits) - 1
    fx, fy = mvx & mask, mvy & mask
    lo = taps // 2 - 1

    def at(yy, xx):
        return int(ref[min(max(yy, 0), H - 1), min(max(xx, 0), W - 1)])

    out = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            if fx == 0 and fy == 0:
                p14 = at(iy + r, ix + c) << 6
            elif fy == 0:
                p14 = sum(filt[fx][i] * at(iy + r, ix + c - lo + i)
                          for i in range(taps))
            elif fx == 0:
                p14 = sum(filt[fy][i] * at(iy + r - lo + i, ix + c)
                          for i in range(taps))
            else:
                acc = 0
                for i in range(taps):
                    hh = sum(filt[fx][j]
                             * at(iy + r - lo + i, ix + c - lo + j)
                             for j in range(taps))
                    acc += filt[fy][i] * hh
                p14 = acc >> 6
            out[r, c] = min(max((p14 + 32) >> 6, 0), 255)
    return out


def test_fractional_mc_matches_spec_reference():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 256, (24, 28), dtype=np.uint8).astype(
        np.int64)
    for _ in range(24):
        mvx = int(rng.integers(-20, 21))
        mvy = int(rng.integers(-20, 21))
        x0 = int(rng.integers(0, 12))
        y0 = int(rng.integers(0, 8))
        fast = h5._mc_luma(ref, x0, y0, 8, 8, (mvx, mvy))
        slow = _mc_ref_naive(ref, x0, y0, 8, 8, mvx, mvy,
                             8, h5._LUMA_FILT, 2)
        assert np.array_equal(fast, slow), (mvx, mvy, x0, y0)
        fastc = h5._mc_chroma(ref, x0, y0, 4, 4, (mvx, mvy))
        slowc = _mc_ref_naive(ref, x0, y0, 4, 4, mvx, mvy,
                              4, h5._CHROMA_FILT, 3)
        assert np.array_equal(fastc, slowc), ("chroma", mvx, mvy)


def test_p_gop_fuzz_roundtrip():
    # random GOPs with random motion/noise/QP: encoder recon must
    # equal decode for every frame (lossless and lossy)
    rng = np.random.default_rng(0xBEEF)
    for trial in range(8):
        h = int(rng.integers(2, 4)) * 16
        w = int(rng.integers(2, 5)) * 16
        n_frames = int(rng.integers(2, 5))
        cur = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(
            np.int64)
        frames = [cur.copy()]
        for _ in range(n_frames - 1):
            mode = rng.integers(0, 3)
            if mode == 0:                        # translation
                cur = np.roll(cur, (int(rng.integers(-8, 9)),
                                    int(rng.integers(-8, 9))),
                              axis=(0, 1))
            elif mode == 1:                      # split motion
                cur = cur.copy()
                cur[: h // 2] = np.roll(cur[: h // 2],
                                        int(rng.integers(-4, 5)),
                                        axis=1)
            else:                                # new content
                cur = rng.integers(0, 256, (h, w),
                                   dtype=np.uint8).astype(np.int64)
            cur = np.clip(cur + rng.integers(-2, 3, (h, w)), 0, 255)
            frames.append(cur.copy())
        lossless = bool(rng.integers(0, 2))
        qp = int(rng.integers(16, 46))
        recon = []
        stream = h5.h265_encode_gop_planes(
            [(f, _neutral(h, w), _neutral(h, w)) for f in frames],
            qp=qp, lossless=lossless, recon_out=recon, search=3)
        dec, _ = h5.h265_decode_gop_planes(stream)
        for i, ((ry, rcb, rcr), (dy_, dcb, dcr)) in enumerate(
                zip(recon, dec)):
            assert np.array_equal(ry, dy_), (trial, i)
            assert np.array_equal(rcb, dcb), (trial, i)
            assert np.array_equal(rcr, dcr), (trial, i)
        if lossless:
            for src, (Y, _cb, _cr) in zip(frames, dec):
                assert np.array_equal(Y, src)


def test_p_stream_corruption_contract():
    rng = np.random.default_rng(77)
    f0 = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    f1 = np.roll(f0, 5, axis=1)
    base = h5.h265_encode_gop([f0, f1], qp=30)
    rnd = random.Random(19)
    for _ in range(120):
        b = bytearray(base)
        for _ in range(rnd.randint(1, 4)):
            b[rnd.randrange(len(b))] = rnd.randrange(256)
        try:
            h5.h265_decode_gop_planes(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(base), 11):
        try:
            h5.h265_decode_gop_planes(base[:cut])
        except (ValueError, NotImplementedError):
            pass


def test_p_foreign_stream_rejected():
    f0 = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    stream = h5.h265_encode_gop([f0, np.roll(f0, 2, axis=0)], qp=30)
    parts = [h5._nal(t, rbsp, tid=ti)
             for t, _l, ti, rbsp in h5._split_annexb_h265(stream)
             if t != h5._NAL_PREFIX_SEI]         # strip the marker
    with pytest.raises(NotImplementedError, match="third-party"):
        h5.h265_decode_gop_planes(b"".join(parts))


# ---------------------------------------------------------------------------
# B slices (r8): bi-prediction, two-list DPB, POC output reordering
# ---------------------------------------------------------------------------


def test_b_gop_lossless_exact_and_reordered():
    rng = np.random.default_rng(51)
    f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    frames = [np.roll(f0, (2 * k, 3 * k), axis=(0, 1))
              for k in range(5)]
    stream = h5.h265_encode_gop(frames, lossless=True, b_frames=True)
    dec, crop = h5.h265_decode_gop_planes(stream)
    assert crop == (0, 0, 0, 0) and len(dec) == 5
    # decode must return DISPLAY order despite I P B P B coding order
    for src, (Y, _cb, _cr) in zip(frames, dec):
        assert np.array_equal(Y, src.astype(np.int64))


def test_b_gop_lossy_decode_equals_encoder_reconstruction():
    rng = np.random.default_rng(52)
    for trial in range(6):
        h = int(rng.integers(2, 4)) * 16
        w = int(rng.integers(2, 5)) * 16
        n = int(rng.integers(2, 7))
        cur = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(
            np.int64)
        frames = [cur.copy()]
        for _ in range(n - 1):
            cur = np.roll(cur, (int(rng.integers(-5, 6)),
                                int(rng.integers(-5, 6))),
                          axis=(0, 1))
            cur = np.clip(cur + rng.integers(-2, 3, (h, w)), 0, 255)
            frames.append(cur.copy())
        lossless = bool(rng.integers(0, 2))
        qp = int(rng.integers(16, 44))
        recon = []
        stream = h5.h265_encode_gop(
            [f for f in frames], qp=qp, lossless=lossless,
            recon_out=recon, b_frames=True, search=3)
        dec, _ = h5.h265_decode_gop_planes(stream)
        assert len(dec) == len(recon) == n
        for i, ((ry, rcb, rcr), (dy_, dcb, dcr)) in enumerate(
                zip(recon, dec)):
            assert np.array_equal(ry, dy_), (trial, i)
            assert np.array_equal(rcb, dcb), (trial, i)
            assert np.array_equal(rcr, dcr), (trial, i)


def test_b_cu_modes_all_exercised():
    stats = {"skip": 0, "merge": 0, "amvp_l0": 0, "amvp_l1": 0,
             "amvp_bi": 0}
    orig = h5._commit_cu_p

    def spy(*a, **k):
        plan = orig(*a, **k)
        if plan.get("inter") and plan["skip"]:
            stats["skip"] += 1
        elif plan.get("inter"):
            for syn in plan["pus"]:
                if syn[0] == "merge":
                    stats["merge"] += 1
                else:
                    stats["amvp_" + {1: "l0", 2: "l1",
                                     3: "bi"}[syn[1]]] += 1
        return plan

    rng = np.random.default_rng(9)
    h, w = 48, 64
    cur = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.int64)
    frames = [cur.copy()]
    for _ in range(6):
        cur = cur.copy()
        cur[:24] = np.roll(cur[:24], int(rng.integers(-3, 4)), axis=1)
        cur[24:] = np.roll(cur[24:], int(rng.integers(-3, 4)), axis=1)
        cur = np.clip(cur + rng.integers(-2, 3, (h, w)), 0, 255)
        frames.append(cur.copy())
    h5._commit_cu_p = spy
    try:
        recon = []
        stream = h5.h265_encode_gop(frames, qp=30, b_frames=True,
                                    recon_out=recon, search=3)
    finally:
        h5._commit_cu_p = orig
    dec, _ = h5.h265_decode_gop_planes(stream)
    for (ry, _rcb, _rcr), (dy_, _dcb, _dcr) in zip(recon, dec):
        assert np.array_equal(ry, dy_)
    for k, v in stats.items():
        assert v > 0, f"B CU kind {k} never exercised"


def test_mv_scale_symmetric_negation():
    # §8.5.3.2.8 with tb = -(td): symmetric B distances scale a
    # cross-list AMVP candidate to its exact negation
    for mv in ((5, -3), (-128, 64), (1, 0), (0, 0), (-1, 7)):
        assert h5._mv_scale(mv, 1, -1) == (-mv[0], -mv[1])
        assert h5._mv_scale(mv, -1, 1) == (-mv[0], -mv[1])
        assert h5._mv_scale(mv, 1, 1) == mv        # identity path


def test_b_hvc1_mp4_end_to_end():
    from gorillaspark.operators import media_codecs as mc
    rng = np.random.default_rng(53)
    f0 = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    frames = [np.roll(f0, (2 * k, 3 * k), axis=(0, 1))
              for k in range(5)]
    ab = h5.h265_encode_gop(frames, lossless=True, b_frames=True)
    samples, hvcc = h5.hevc_gop_to_hvc1_samples(ab)
    order = h5._b_coding_order(5)
    assert [d for d, *_ in order] == [0, 2, 1, 4, 3]
    ctts = [(disp - i) * 500 for i, (disp, *_ ) in enumerate(order)]
    mp4 = mc.mp4_mux(samples, frame_ms=500, fourcc=b"hvc1",
                     width=16, height=16,
                     config=mc._box(b"hvcC", hvcc),
                     ctts_offsets=ctts)
    feats = list(mc.mp4_sample_frame_features(mp4, every_ms=1000))
    # presentation timeline 0,500,...: sampled at 0, 1000, 2000 ms
    assert [ts for _i, ts, _f in feats] == [0, 1000, 2000]
    # lossless grey decode: sum_r equals the display frame's luma sum
    for (_i, _ts, f), k in zip(feats, (0, 2, 4)):
        assert f["sum_r"] == int(frames[k].astype(np.int64).sum())


def test_merge_small_pu_bi_conversion():
    # §8.5.3.2.2: 8x4/4x8 PUs convert bi merge candidates to L0-only
    fr = h5._Frame5(32, 32)
    h5._mark_inter(fr, 0, 0, 8, 8, 0, (3, (4, 0), (0, 4)), False)
    small = h5._merge_candidates(fr, 8, 0, 8, 4, 5, slice_type=0)
    assert all(c[0] != 3 for c in small)
    assert small[0] == (1, (4, 0), (0, 0))
    full = h5._merge_candidates(fr, 8, 0, 8, 8, 5, slice_type=0)
    assert full[0] == (3, (4, 0), (0, 4))


def test_amp_partitions_exercised():
    # motion boundaries at the quarter split of a CTB force the AMP
    # shapes (2NxnU/2NxnD/nLx2N/nRx2N) — and decode stays bit-exact
    parts = {}
    orig = h5._commit_cu_p

    def spy(*a, **k):
        plan = orig(*a, **k)
        if plan.get("inter") and not plan["skip"]:
            parts[plan["part"]] = parts.get(plan["part"], 0) + 1
        return plan

    rng = np.random.default_rng(71)
    h, w = 32, 32
    base = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(
        np.int64)
    f1 = base.copy()                 # top 4 rows vs rest: 2NxnU
    f1[:4] = np.roll(base[:4], 3, axis=1)
    f1[4:] = np.roll(base[4:], -3, axis=1)
    f2 = f1.copy()                   # bottom 4 rows: 2NxnD
    f2[-4:] = np.roll(f1[-4:], 3, axis=1)
    f2[:-4] = np.roll(f1[:-4], -3, axis=1)
    f3 = f2.copy()                   # left 4 cols: nLx2N
    f3[:, :4] = np.roll(f2[:, :4], 3, axis=0)
    f3[:, 4:] = np.roll(f2[:, 4:], -3, axis=0)
    f4 = f3.copy()                   # right 4 cols: nRx2N
    f4[:, -4:] = np.roll(f3[:, -4:], 3, axis=0)
    f4[:, :-4] = np.roll(f3[:, :-4], -3, axis=0)
    h5._commit_cu_p = spy
    try:
        recon = []
        stream = h5.h265_encode_gop_planes(
            [(f, _neutral(h, w), _neutral(h, w))
             for f in (base, f1, f2, f3, f4)],
            qp=30, recon_out=recon, force_split=False)
    finally:
        h5._commit_cu_p = orig
    dec, _ = h5.h265_decode_gop_planes(stream)
    for (ry, _rcb, _rcr), (dy_, _dcb, _dcr) in zip(recon, dec):
        assert np.array_equal(ry, dy_)
    for shape in ("2NxnU", "2NxnD", "nLx2N", "nRx2N"):
        assert parts.get(shape, 0) > 0, (shape, parts)


# ---------------------------------------------------------------------------
# SAO (late r8): band/edge offsets, merge flags, in-loop references
# ---------------------------------------------------------------------------


def test_sao_improves_and_round_trips():
    # smooth gradient + noise: SAO must reduce (or match) the coded
    # error, decode must equal the encoder recon bit-exactly, and
    # both band and edge types should fire somewhere
    rng = np.random.default_rng(81)
    xg, yg = np.meshgrid(np.arange(64), np.arange(48))
    y = np.clip((xg * 3 + yg * 2) % 256
                + rng.integers(-8, 9, (48, 64)), 0, 255).astype(
        np.uint8)
    kinds = set()
    orig = h5._sao_choose_comp

    def spy(*a, **k):
        p = orig(*a, **k)
        if p is not None:
            kinds.add(p[0])
        return p

    h5._sao_choose_comp = spy
    try:
        p_on = h5.h265_encode(y, qp=34, sao=True)
    finally:
        h5._sao_choose_comp = orig
    p_off = h5.h265_encode(y, qp=34, sao=False)
    Y_on, _, _, _ = h5.h265_decode_planes(p_on)
    Y_off, _, _, _ = h5.h265_decode_planes(p_off)
    Yr, _, _, _ = h5.h265_encoder_reconstruction(y, qp=34, sao=True)
    assert np.array_equal(Y_on, Yr)
    src = y.astype(np.int64)
    sse_on = int(((Y_on - src) ** 2).sum())
    sse_off = int(((Y_off - src) ** 2).sum())
    assert sse_on <= sse_off
    assert "eo" in kinds or "bo" in kinds


def test_sao_merge_flags_exercised():
    # flat content -> all-off params everywhere -> merge-left/up
    y = np.full((48, 64), 77, dtype=np.uint8)
    merges = [0]
    orig = h5._ser_sao

    def spy(enc, ctx, cx, cy, params, all_params, sh):
        if cx > 0 and params == all_params[(cx - 1, cy)]:
            merges[0] += 1
        elif cy > 0 and params == all_params[(cx, cy - 1)]:
            merges[0] += 1
        return orig(enc, ctx, cx, cy, params, all_params, sh)

    h5._ser_sao = spy
    try:
        p = h5.h265_encode(y, qp=30, sao=True, force_split=False)
    finally:
        h5._ser_sao = orig
    assert merges[0] > 0
    Y, _, _, _ = h5.h265_decode_planes(p)
    Yr, _, _, _ = h5.h265_encoder_reconstruction(
        y, qp=30, sao=True, force_split=False)
    assert np.array_equal(Y, Yr)


def test_sao_gop_references_filtered_frames():
    # P/B frames predict from the SAO-filtered reference: parity
    # would break if encoder and decoder disagreed about filtering
    rng = np.random.default_rng(83)
    f0 = rng.integers(0, 256, (32, 48), dtype=np.uint8).astype(
        np.int64)
    frames = [f0]
    cur = f0
    for _ in range(3):
        cur = np.clip(np.roll(cur, (2, 3), axis=(0, 1))
                      + rng.integers(-4, 5, (32, 48)), 0, 255)
        frames.append(cur.copy())
    for b in (False, True):
        recon = []
        s = h5.h265_encode_gop(frames, qp=33, b_frames=b,
                               recon_out=recon, search=3)
        dec, _ = h5.h265_decode_gop_planes(s)
        for i, ((ry, rcb, rcr), (dy_, dcb, dcr)) in enumerate(
                zip(recon, dec)):
            assert np.array_equal(ry, dy_), (b, i)
            assert np.array_equal(rcb, dcb), (b, i)
            assert np.array_equal(rcr, dcr), (b, i)


def test_sao_lossless_opts_out():
    # transquant-bypass streams must never be SAO-perturbed, even
    # when the caller leaves sao=True
    y = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    p = h5.h265_encode(y, lossless=True, sao=True)
    Y, _, _, _ = h5.h265_decode_planes(p)
    assert np.array_equal(Y, y.astype(np.int64))


# ---------------------------------------------------------------------------
# Deblocking (late r8): 8-grid edges, bS derivation, in-loop refs
# ---------------------------------------------------------------------------


def test_deblock_smooths_blocky_ramp_and_round_trips():
    xg, yg = np.meshgrid(np.arange(64), np.arange(48))
    y = np.clip((xg * 2 + yg * 3) // 2, 0, 255).astype(np.uint8)
    p_on = h5.h265_encode(y, qp=40, sao=False)
    p_off = h5.h265_encode(y, qp=40, sao=False, deblock=False)
    Y_on, _, _, _ = h5.h265_decode_planes(p_on)
    Y_off, _, _, _ = h5.h265_decode_planes(p_off)
    Yr, _, _, _ = h5.h265_encoder_reconstruction(y, qp=40, sao=False)
    assert np.array_equal(Y_on, Yr)
    assert not np.array_equal(Y_on, Y_off)       # the filter fired
    src = y.astype(np.int64)
    assert ((Y_on - src) ** 2).sum() < ((Y_off - src) ** 2).sum()


def test_deblock_gop_references_filtered_frames():
    # P/B prediction reads the deblocked+SAO'd reference; parity
    # would desync if either side filtered differently
    rng = np.random.default_rng(91)
    xg, yg = np.meshgrid(np.arange(48), np.arange(32))
    cur = np.clip((xg * 3 + yg * 2) // 2
                  + rng.integers(-6, 7, (32, 48)), 0, 255)
    frames = [cur.copy()]
    for _ in range(3):
        cur = np.clip(np.roll(cur, (2, 3), axis=(0, 1))
                      + rng.integers(-3, 4, (32, 48)), 0, 255)
        frames.append(cur.copy())
    for b in (False, True):
        recon = []
        s = h5.h265_encode_gop(frames, qp=38, b_frames=b,
                               recon_out=recon, search=3)
        dec, _ = h5.h265_decode_gop_planes(s)
        for i, ((ry, rcb, rcr), (dy_, dcb, dcr)) in enumerate(
                zip(recon, dec)):
            assert np.array_equal(ry, dy_), (b, i)
            assert np.array_equal(rcb, dcb), (b, i)
            assert np.array_equal(rcr, dcr), (b, i)


def test_deblock_lossless_opts_out():
    y = RNG.integers(0, 256, (32, 32), dtype=np.uint8)
    p = h5.h265_encode(y, lossless=True, deblock=True)
    Y, _, _, _ = h5.h265_decode_planes(p)
    assert np.array_equal(Y, y.astype(np.int64))


def test_deblock_fuzz_parity():
    # mixed smooth/noisy GOPs across QPs: decode == encoder recon
    rng = np.random.default_rng(92)
    for trial in range(5):
        h, w = 32, 48
        xg, yg = np.meshgrid(np.arange(w), np.arange(h))
        smooth = (xg * int(rng.integers(1, 4))
                  + yg * int(rng.integers(1, 4))) % 256
        noise = rng.integers(0, 256, (h, w))
        mix = np.where(rng.random((h, w)) < 0.5, smooth, noise)
        frames = [np.clip(mix, 0, 255)]
        for _ in range(2):
            frames.append(np.clip(
                np.roll(frames[-1], (2, -3), axis=(0, 1))
                + rng.integers(-3, 4, (h, w)), 0, 255))
        qp = int(rng.integers(20, 48))
        recon = []
        s = h5.h265_encode_gop(frames, qp=qp, b_frames=bool(trial % 2),
                               recon_out=recon, search=3)
        dec, _ = h5.h265_decode_gop_planes(s)
        for i, ((ry, rcb, rcr), (dy_, dcb, dcr)) in enumerate(
                zip(recon, dec)):
            assert np.array_equal(ry, dy_), (trial, i)
            assert np.array_equal(rcb, dcb), (trial, i)
            assert np.array_equal(rcr, dcr), (trial, i)


def test_trail_n_final_picture_decodes():
    # a non-reference final picture (TRAIL_N, nal type 0) is legal
    # and decodes identically — nothing references it
    rng = np.random.default_rng(95)
    f0 = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    frames = [f0, np.roll(f0, 3, axis=1), np.roll(f0, 6, axis=1)]
    stream = h5.h265_encode_gop(frames, lossless=True)
    nals = list(h5._split_annexb_h265(stream))
    last_vcl = max(i for i, (t, *_rest) in enumerate(nals) if t < 32)
    parts = []
    for i, (t, _l, ti, rbsp) in enumerate(nals):
        if i == last_vcl and t == h5._NAL_TRAIL_R:
            t = h5._NAL_TRAIL_N
        parts.append(h5._nal(t, rbsp, tid=ti))
    dec, _ = h5.h265_decode_gop_planes(b"".join(parts))
    assert len(dec) == 3
    for src, (Y, _cb, _cr) in zip(frames, dec):
        assert np.array_equal(Y, src.astype(np.int64))
