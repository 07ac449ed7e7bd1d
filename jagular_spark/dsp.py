"""Pure-numpy DSP kernels (no scipy in the runtime).

Implements the signal kernels the reference gets from scipy
(``jagular/filtering.py``, ``jagular/alignment.py``) from standard
public DSP math:

- Butterworth IIR design (zpk → bilinear transform → SOS cascade)
- SOS filtering (direct form II transposed) + steady-state initial
  conditions + zero-phase forward-backward (odd-extension padding) —
  the ``sosfiltfilt`` equivalent.
- Windowed-sinc FIR band-pass + exactly-zero-phase centered
  convolution — the vectorized fast path (symmetric FIR has finite
  support, so halo-chunked == unchunked EXACTLY when the halo covers
  half the kernel; this is the preferred kernel at scale).
- Natural cubic spline evaluation for sub-sample waveform alignment.

These run inside Arrow pandas UDFs on executors; the same functions
serve as the in-core test oracle, so tests pin the *distribution*
logic (chunk/halo/partition correctness), not the numerics.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Butterworth design (analog prototype → bilinear → SOS)
# ---------------------------------------------------------------------------


def _butter_prototype(order: int) -> np.ndarray:
    """Analog lowpass Butterworth poles on the unit circle (gain 1)."""
    k = np.arange(1, order + 1)
    theta = np.pi * (2 * k + order - 1) / (2 * order)
    return np.exp(1j * theta)


def _bilinear_zpk(z, p, k, fs: float):
    fs2 = 2.0 * fs
    z = np.asarray(z, dtype=complex)
    p = np.asarray(p, dtype=complex)
    degree = len(p) - len(z)
    z_z = (fs2 + z) / (fs2 - z)
    p_z = (fs2 + p) / (fs2 - p)
    z_z = np.append(z_z, -np.ones(degree))
    k_z = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    return z_z, p_z, k_z


def _zpk_to_sos(z, p, k) -> np.ndarray:
    """Pair conjugate roots into biquad sections (simple nearest-pairing;
    adequate for Butterworth's well-separated roots)."""

    def pair(roots):
        roots = np.asarray(roots, dtype=complex)
        tol = 1e-9
        reals = sorted(roots[np.abs(roots.imag) < tol].real.tolist())
        upper = sorted(roots[roots.imag >= tol].tolist(), key=lambda r: (r.real, r.imag))
        lower = list(roots[roots.imag <= -tol])
        pairs = []
        for r in upper:
            # nearest conjugate partner from the lower half-plane
            j = int(np.argmin([abs(c - np.conj(r)) for c in lower]))
            pairs.append((r, lower.pop(j)))
        # any unpaired lower-half roots shouldn't exist for real filters,
        # but fold them in defensively
        for r in lower:
            pairs.append((r, np.conj(r)))
        singles = list(reals)
        while len(singles) >= 2:
            pairs.append((singles.pop(), singles.pop()))
        return pairs, singles

    zp, zs = pair(z)
    pp, ps = pair(p)
    n_sections = max(len(zp) + (1 if zs else 0), len(pp) + (1 if ps else 0))
    sos = []
    for i in range(n_sections):
        if i < len(zp):
            b = np.real(np.poly([zp[i][0], zp[i][1]]))
        elif zs:
            b = np.real(np.poly([zs.pop()]))
            b = np.append(b, 0.0)
        else:
            b = np.array([1.0, 0.0, 0.0])
        if i < len(pp):
            a = np.real(np.poly([pp[i][0], pp[i][1]]))
        elif ps:
            a = np.real(np.poly([ps.pop()]))
            a = np.append(a, 0.0)
        else:
            a = np.array([1.0, 0.0, 0.0])
        b = np.pad(b, (0, 3 - len(b)))
        a = np.pad(a, (0, 3 - len(a)))
        sos.append(np.concatenate([b, a]))
    sos = np.asarray(sos)
    sos[0, :3] *= k
    return sos


def _cheby2_prototype(order: int, rs: float):
    """Analog Chebyshev-II lowpass prototype, stopband edge at 1,
    ``rs`` dB stopband attenuation. Standard construction: zeros on the
    jω axis at 1/cos(θ), poles are reciprocals of the Chebyshev-I-type
    pole locations."""
    de = 1.0 / np.sqrt(10 ** (0.1 * rs) - 1.0)
    mu = np.arcsinh(1.0 / de) / order
    m = np.arange(-order + 1, order, 2)
    # jω-axis zeros at 1/sin(θ); odd order drops the θ=0 (infinite) zero
    sinang = np.sin(np.pi * m / (2 * order))
    sinang = sinang[np.abs(sinang) > 1e-12]
    z = -np.conj(1j / sinang)
    p = -np.exp(1j * np.pi * m / (2 * order))
    p = np.sinh(mu) * p.real + 1j * np.cosh(mu) * p.imag
    p = 1.0 / p
    k = np.real(np.prod(-p) / np.prod(-z))
    return z, p, k


def _lp2lp_zpk(z, p, k, wo):
    degree = len(p) - len(z)
    return z * wo, p * wo, k * wo**degree


def _lp2hp_zpk(z, p, k, wo):
    degree = len(p) - len(z)
    z_hp = np.append(wo / z if len(z) else [], np.zeros(degree))
    p_hp = wo / p
    k_hp = k * np.real(np.prod(-z) / np.prod(-p)) if len(z) else k * np.real(1.0 / np.prod(-p))
    return z_hp, p_hp, k_hp


def _lp2bp_zpk(z, p, k, wo, bw):
    degree = len(p) - len(z)
    z_lp = z * bw / 2.0
    p_lp = p * bw / 2.0
    z_bp = np.concatenate([z_lp + np.sqrt(z_lp**2 - wo**2 + 0j), z_lp - np.sqrt(z_lp**2 - wo**2 + 0j)]) if len(z) else np.array([], dtype=complex)
    p_bp = np.concatenate([p_lp + np.sqrt(p_lp**2 - wo**2 + 0j), p_lp - np.sqrt(p_lp**2 - wo**2 + 0j)])
    z_bp = np.append(z_bp, np.zeros(degree))
    k_bp = k * bw**degree
    return z_bp, p_bp, k_bp


def _design_digital(proto, Wn, btype: str) -> np.ndarray:
    fs = 2.0
    z, p, k = proto
    if btype in ("lowpass", "highpass"):
        wc = 2.0 * fs * np.tan(np.pi * float(Wn) / fs)
        z, p, k = (_lp2lp_zpk if btype == "lowpass" else _lp2hp_zpk)(z, p, k, wc)
    elif btype == "bandpass":
        w1 = 2.0 * fs * np.tan(np.pi * float(Wn[0]) / fs)
        w2 = 2.0 * fs * np.tan(np.pi * float(Wn[1]) / fs)
        z, p, k = _lp2bp_zpk(z, p, k, np.sqrt(w1 * w2), w2 - w1)
    else:
        raise ValueError(f"btype {btype!r} not supported")
    z, p, k = _bilinear_zpk(z, p, k, fs)
    return _zpk_to_sos(z, p, k)


def butter_sos(order: int, Wn, btype: str = "lowpass") -> np.ndarray:
    """Digital Butterworth as SOS. ``Wn``: corner(s) normalized to
    Nyquist (0..1)."""
    p = _butter_prototype(order)
    return _design_digital((np.array([], dtype=complex), p, 1.0), Wn, btype)


def cheby2_sos(order: int, rs: float, Wn, btype: str = "lowpass") -> np.ndarray:
    """Digital Chebyshev-II as SOS; ``Wn`` is the STOPBAND edge
    (normalized to Nyquist), ``rs`` dB attenuation — the reference's
    preferred family (cheby2, gstop 30 dB)."""
    return _design_digital(_cheby2_prototype(order, rs), Wn, btype)


def iir_order_estimate(wp, ws, gpass: float, gstop: float, ftype: str = "cheby2") -> int:
    """Minimum order meeting the pass/stop spec (standard formulas).
    ``wp``/``ws`` normalized to Nyquist; scalars or (lo, hi) pairs."""

    def warp(w):
        return np.tan(np.pi * np.asarray(w, dtype=np.float64) / 2.0)

    wp_w, ws_w = warp(wp), warp(ws)
    if np.ndim(wp_w) == 0:
        nat = ws_w / wp_w if ws_w > wp_w else wp_w / ws_w
    else:
        # bandpass: selectivity at each stopband edge vs the passband
        bw = wp_w[1] - wp_w[0]
        w0sq = wp_w[0] * wp_w[1]
        nat = min(
            abs((ws_w[0] ** 2 - w0sq) / (ws_w[0] * bw)),
            abs((ws_w[1] ** 2 - w0sq) / (ws_w[1] * bw)),
        )
    d = (10 ** (0.1 * gstop) - 1.0) / (10 ** (0.1 * gpass) - 1.0)
    if ftype in ("cheby1", "cheby2"):
        n = np.arccosh(np.sqrt(d)) / np.arccosh(nat)
    else:
        n = np.log10(d) / (2.0 * np.log10(nat))
    return max(1, int(np.ceil(n)))


# ---------------------------------------------------------------------------
# SOS filtering + zero phase
# ---------------------------------------------------------------------------


def sosfilt(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None):
    """Direct-form-II-transposed cascade. Returns (y, zf). ``zi`` shape
    (n_sections, 2)."""
    sos = np.asarray(sos, dtype=np.float64)
    n_sections = sos.shape[0]
    y = np.asarray(x, dtype=np.float64).copy()
    z = np.zeros((n_sections, 2)) if zi is None else np.array(zi, dtype=np.float64, copy=True)
    for s in range(n_sections):
        b0, b1, b2, _, a1, a2 = sos[s]
        z0, z1 = z[s]
        out = np.empty_like(y)
        for i in range(len(y)):
            xi = y[i]
            yi = b0 * xi + z0
            z0 = b1 * xi - a1 * yi + z1
            z1 = b2 * xi - a2 * yi
            out[i] = yi
        y = out
        z[s, 0], z[s, 1] = z0, z1
    return y, z


def sosfilt_zi(sos: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a unit-amplitude step —
    removes start-up transients in filtfilt (same construction as the
    classical lfilter_zi companion-matrix solve)."""
    sos = np.asarray(sos, dtype=np.float64)
    zi = np.zeros((sos.shape[0], 2))
    scale = 1.0
    for s in range(sos.shape[0]):
        b = sos[s, :3]
        a = sos[s, 3:]
        A = np.array([[1.0 + a[1], -1.0], [a[2], 1.0]])
        Bv = np.array([b[1] - a[1] * b[0], b[2] - a[2] * b[0]])
        zi[s] = np.linalg.solve(A, Bv) * scale
        scale *= np.sum(b) / np.sum(a)  # section DC gain
    return zi


def sosfiltfilt(sos: np.ndarray, x: np.ndarray, padlen: int | None = None) -> np.ndarray:
    """Zero-phase forward-backward SOS filtering with odd-extension
    padding and steady-state initial conditions."""
    x = np.asarray(x, dtype=np.float64)
    n_sections = len(sos)
    if padlen is None:
        padlen = 3 * (2 * n_sections + 1)
    padlen = min(padlen, len(x) - 1)
    if padlen > 0:
        front = 2.0 * x[0] - x[padlen:0:-1]
        back = 2.0 * x[-1] - x[-2 : -padlen - 2 : -1]
        ext = np.concatenate([front, x, back])
    else:
        ext = x
    zi = sosfilt_zi(sos)
    y, _ = sosfilt(sos, ext, zi=zi * ext[0])
    y = y[::-1]
    y, _ = sosfilt(sos, y, zi=zi * y[0])
    y = y[::-1]
    return y[padlen : len(y) - padlen] if padlen > 0 else y


# ---------------------------------------------------------------------------
# FIR fast path (vectorized; exact halo semantics)
# ---------------------------------------------------------------------------


def firwin_bandpass(numtaps: int, fl: float | None, fh: float | None, fs: float) -> np.ndarray:
    """Windowed-sinc (Hamming) band/low/high-pass, odd ``numtaps``,
    symmetric → linear phase → exactly zero phase when centered."""
    if numtaps % 2 == 0:
        numtaps += 1
    m = np.arange(numtaps) - (numtaps - 1) / 2
    window = np.hamming(numtaps)

    def sinc_lp(fc):
        w = 2.0 * fc / fs
        return w * np.sinc(w * m)

    if fl is not None and fh is not None:
        h = sinc_lp(fh) - sinc_lp(fl)
    elif fh is not None:  # lowpass
        h = sinc_lp(fh)
    elif fl is not None:  # highpass = delta - lowpass
        h = -sinc_lp(fl)
        h[(numtaps - 1) // 2] += 1.0
    else:
        raise ValueError("all-pass is not a filter")
    h *= window
    # normalize passband gain
    if fl is not None and fh is not None:
        f0 = np.sqrt(fl * fh)
        gain = np.abs(np.sum(h * np.exp(-2j * np.pi * f0 / fs * np.arange(numtaps))))
    elif fh is not None:
        gain = np.sum(h)
    else:
        gain = np.abs(np.sum(h * np.cos(np.pi * np.arange(numtaps) - np.pi * (numtaps - 1) / 2)))
        gain = gain if gain > 0 else 1.0
    return h / gain


def fir_zero_phase(taps: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Centered convolution with a symmetric FIR: zero-phase, reflect
    edge padding (``x[-j] ≡ x[j]``, ``x[n-1+j] ≡ x[n-1-j]``).

    DETERMINISTIC BY CONSTRUCTION: ``y[i] = ((0 + t₀·x[r₀]) + t₁·x[r₁])
    + …`` accumulates in fixed ascending-tap order, so the result is
    bit-identical to any other engine folding the same sequence (the
    DuckDB ``list_reduce`` oracle) AND halo-chunked == unchunked is an
    exact equality on interior rows, not a tolerance. An FFT formulation
    would be faster for very long kernels but breaks both properties;
    for the short kernels used here (21-801 taps) the k-loop of
    vectorized multiply-adds is within 2× of FFT anyway.

    Signals shorter than ``numtaps`` return zeros (degenerate-epoch
    rule, mirrors the reference's too-short-epoch behavior).
    """
    taps = np.asarray(taps, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    numtaps = len(taps)
    half = (numtaps - 1) // 2
    if n == 0:
        return x
    if n < numtaps:
        return np.zeros_like(x)
    idx = np.arange(n)
    y = np.zeros(n, dtype=np.float64)
    for k in range(numtaps):
        j = idx + (k - half)
        j = np.abs(j)                      # reflect at the left edge
        j = np.where(j >= n, 2 * (n - 1) - j, j)  # reflect at the right edge
        y += taps[k] * x[j]
    return y


# ---------------------------------------------------------------------------
# Natural cubic spline (alignment resampling)
# ---------------------------------------------------------------------------


def cubic_spline_eval(y: np.ndarray, xnew: np.ndarray) -> np.ndarray:
    """Evaluate the natural cubic spline through ``(i, y[i])`` at
    ``xnew`` (clamped to [0, n-1]). Thomas-algorithm tridiagonal solve."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 3:
        return np.interp(np.clip(xnew, 0, n - 1), np.arange(n), y)
    # second derivatives M: natural boundary M0 = Mn-1 = 0
    rhs = 6.0 * (y[2:] - 2.0 * y[1:-1] + y[:-2])
    a = np.ones(n - 3)
    b = np.full(n - 2, 4.0)
    c = np.ones(n - 3)
    # Thomas
    cp = np.empty(n - 2)
    dp = np.empty(n - 2)
    cp[0] = 1.0 / b[0] if n > 3 else 0.0
    dp[0] = rhs[0] / b[0]
    for i in range(1, n - 2):
        m = b[i] - a[i - 1] * (cp[i - 1] if i - 1 < len(cp) else 0.0)
        cp[i] = (c[i - 1] / m) if i < n - 3 else 0.0
        dp[i] = (rhs[i] - a[i - 1] * dp[i - 1]) / m
    M = np.zeros(n)
    M[n - 2] = dp[n - 3] if n > 3 else dp[0]
    for i in range(n - 4, -1, -1):
        M[i + 1] = dp[i] - cp[i] * M[i + 2]
    xq = np.clip(np.asarray(xnew, dtype=np.float64), 0.0, n - 1.0)
    j = np.clip(np.floor(xq).astype(int), 0, n - 2)
    t = xq - j
    # cubes as explicit multiplies (not **3): IEEE multiply order is
    # deterministic across engines, libm pow is not — keeps the SQL
    # oracle bit-identical
    omt = 1.0 - t
    omt3 = (omt * omt) * omt
    t3 = (t * t) * t
    return (
        M[j] * omt3 / 6.0
        + M[j + 1] * t3 / 6.0
        + (y[j] - M[j] / 6.0) * omt
        + (y[j + 1] - M[j + 1] / 6.0) * t
    )
