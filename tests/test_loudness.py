"""BS.1770-4 loudness (functions/loudness.py): the filter design must
reproduce the spec's published 48 kHz coefficient table, and the gated
measure must satisfy the spec's analytic invariants."""

from __future__ import annotations

import numpy as np
import pytest

from benthos_spark.functions.loudness import (
    integrated_lufs,
    k_weighting_coeffs,
    momentary_max_lufs,
)

FS = 48000


def _sine(freq, fs=FS, secs=2.0, amp=1.0):
    t = np.arange(int(secs * fs)) / fs
    return amp * np.sin(2 * np.pi * freq * t)


def test_coefficients_match_spec_table_at_48k():
    """ITU-R BS.1770-4 Tables 1+2 (fs = 48 kHz)."""
    (b1, a1), (b2, a2) = k_weighting_coeffs(48000)
    assert np.allclose(b1, [1.53512485958697, -2.69169618940638, 1.19839281085285], atol=1e-6)
    assert np.allclose(a1, [1.0, -1.69065929318241, 0.73248077421585], atol=1e-6)
    assert np.allclose(b2, [1.0, -2.0, 1.0], atol=0)
    assert np.allclose(a2, [1.0, -1.99004745483398, 0.99007225036621], atol=1e-6)


def test_full_scale_sine_reads_minus_3():
    """The canonical check: a 997 Hz full-scale sine ≈ −3.01 LKFS."""
    assert integrated_lufs(_sine(997), FS) == pytest.approx(-3.01, abs=0.05)


def test_gain_linearity():
    base = integrated_lufs(_sine(997), FS)
    for db in (-6.0, -20.0, -40.0):
        got = integrated_lufs(_sine(997, amp=10 ** (db / 20.0)), FS)
        assert got - base == pytest.approx(db, abs=1e-6)


def test_other_sample_rates_agree():
    """The re-derived filters at 16/44.1 kHz measure the same sine
    within the bilinear-warp tolerance."""
    for fs in (16000, 44100):
        got = integrated_lufs(_sine(997, fs=fs), fs)
        assert got == pytest.approx(-3.01, abs=0.08)


def test_absolute_gate_silence():
    assert integrated_lufs(np.zeros(FS), FS) == float("-inf")
    # a -80 dBFS murmur is below the -70 absolute gate
    assert integrated_lufs(_sine(997, amp=10 ** (-80 / 20.0)), FS) == float("-inf")


def test_relative_gate_rejects_quiet_tail():
    """Integrated loudness of programme + long quiet tail stays within
    ~0.5 LU of the programme alone (the tail is gated out; only the
    handful of boundary-straddling blocks may drag)."""
    prog = _sine(997, secs=4.0)
    quiet = _sine(997, secs=8.0, amp=10 ** (-60 / 20.0))
    alone = integrated_lufs(prog, FS)
    mixed = integrated_lufs(np.concatenate([prog, quiet]), FS)
    assert mixed == pytest.approx(alone, abs=0.5)


def test_short_clip_single_block():
    """Sub-400 ms clips fall back to one full-length block."""
    got = integrated_lufs(_sine(997, secs=0.2), FS)
    assert got == pytest.approx(-3.01, abs=0.1)


def test_momentary_max_at_least_integrated():
    x = np.concatenate([_sine(997, secs=1.0, amp=0.1), _sine(997, secs=1.0)])
    assert momentary_max_lufs(x, FS) >= integrated_lufs(x, FS)


def test_high_frequency_shelf_boost():
    """K-weighting's high shelf plateaus at +4.04 dB; 997 Hz already
    sits +0.691 dB up the rising edge (exactly the spec's -0.691
    offset), so the 10 kHz vs 997 Hz delta is 3.351 dB — computed from
    the spec's own published 48 kHz coefficient table."""
    hi = integrated_lufs(_sine(10000), FS)
    mid = integrated_lufs(_sine(997), FS)
    assert hi - mid == pytest.approx(3.351, abs=0.05)


def test_low_frequency_rlb_cut():
    """The RLB high-pass (f0≈38 Hz, Q≈0.5) cuts 40 Hz by 5.57 dB and
    20 Hz by 13.3 dB (spec 48 kHz table response); relative to 997 Hz
    (+0.691 dB) that is 6.26 / 13.97 LU."""
    mid = integrated_lufs(_sine(997), FS)
    assert mid - integrated_lufs(_sine(40), FS) == pytest.approx(6.26, abs=0.3)
    assert mid - integrated_lufs(_sine(20), FS) == pytest.approx(13.97, abs=0.5)
