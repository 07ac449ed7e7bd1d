"""Sub-sample waveform peak alignment (SURVEY §2.5 W5-W7).

Reference (re-expressed): fit a parabola through the 3 samples around
the integer peak; the fractional peak is its vertex
(``jagular/alignment.py:7-41``); then resample each channel's waveform
on a grid centered at the fractional peak with a cubic spline or linear
interpolation (``alignment.py:43-108``).

Spark design:
- W5 parabola: for 3 equally spaced points the vertex has the closed
  form ``frac = (y₋₁ − y₊₁) / (2·(y₋₁ − 2·y₀ + y₊₁))`` — pure column
  expressions, no UDF, no linear solve.
- W6/W7 resample: scipy ``cspline1d``/``interp1d`` inside ONE Arrow
  pandas UDF over the waveform array column — vectorized across spikes
  per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# W5: parabola vertex (closed form, JVM-side)
# ---------------------------------------------------------------------------

def parabola_frac_peak(y_m1: Column, y_0: Column, y_p1: Column) -> Column:
    """Fractional offset of the parabola vertex through points
    ``(-1, y₋₁), (0, y₀), (+1, y₊₁)`` — equals ``-b/2a`` of the fitted
    quadratic (reference solves a 3×3 system, ``alignment.py:24-25``;
    for unit spacing it reduces to this closed form). Returns offset in
    samples relative to the integer peak; NULL-safe on flat triples."""
    denom = y_m1 - F.lit(2.0) * y_0 + y_p1
    return F.when(denom != 0, (y_m1 - y_p1) / (F.lit(2.0) * denom)).otherwise(F.lit(0.0))


def with_frac_peak(
    df: DataFrame,
    waveform_col: str = "waveform",
    peak_col: str = "peak_idx",
    out_col: str = "frac_peak",
) -> DataFrame:
    """Attach the sub-sample peak location to spikes whose ``waveform``
    is a flat array and ``peak_idx`` the integer argmin/argmax. Interior
    peaks only (edge peaks keep offset 0)."""
    wf = F.col(waveform_col)
    idx = F.col(peak_col).cast("int")
    y_m1 = F.element_at(wf, idx)          # element_at is 1-based: idx-1 in 0-based
    y_0 = F.element_at(wf, idx + 1)
    y_p1 = F.element_at(wf, idx + 2)
    offset = F.when(
        (idx >= 1) & (idx + 2 <= F.size(wf)),
        parabola_frac_peak(y_m1.cast("double"), y_0.cast("double"), y_p1.cast("double")),
    ).otherwise(F.lit(0.0))
    return df.withColumn(out_col, idx.cast("double") + offset)


def argmin_index(waveform_col: str = "waveform") -> Column:
    """0-based index of the first minimum of an array column."""
    wf = F.col(waveform_col)
    return (F.array_position(wf, F.array_min(wf)) - 1).cast("int")


def argmax_index(waveform_col: str = "waveform") -> Column:
    wf = F.col(waveform_col)
    return (F.array_position(wf, F.array_max(wf)) - 1).cast("int")


# ---------------------------------------------------------------------------
# W6/W7: spline resample around the fractional peak
# ---------------------------------------------------------------------------

def align_waveforms(
    df: DataFrame,
    waveform_col: str = "waveform",
    samples_before: int | None = None,
    samples_after: int | None = None,
    mode: str = "cspline",
    polarity: str = "neg",
) -> DataFrame:
    """Align multi-channel waveforms to their common sub-sample peak
    (reference ``align_waveform_to_peak``, ``alignment.py:58-108``).

    ``waveform_col``: ``array<array<float>>`` — channels × samples.
    Picks the channel with the largest |peak|, fits the parabola there,
    then resamples EVERY channel at ``[frac − before, frac + after)``.
    One Arrow-batched pandas UDF; scipy kernels shared with the oracle.
    """
    num_samples_col = F.size(F.element_at(F.col(waveform_col), 1))

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.FloatType())))
    def align(wfs: pd.Series) -> pd.Series:
        from jagular_spark.dsp import cubic_spline_eval

        out = []
        for wf in wfs:
            w = np.asarray([np.asarray(ch, dtype=np.float64) for ch in wf])
            n_ch, n_s = w.shape
            s_before = samples_before if samples_before is not None else n_s // 2
            s_after = samples_after if samples_after is not None else n_s - n_s // 2
            # channel with the dominant extremum
            if polarity == "neg":
                ch_best = int(np.argmin(w.min(axis=1)))
                p = int(np.argmin(w[ch_best]))
            else:
                ch_best = int(np.argmax(w.max(axis=1)))
                p = int(np.argmax(w[ch_best]))
            if 1 <= p <= n_s - 2:
                y = w[ch_best, p - 1 : p + 2]
                denom = y[0] - 2.0 * y[1] + y[2]
                frac = p + ((y[0] - y[2]) / (2.0 * denom) if denom != 0 else 0.0)
            else:
                frac = float(p)
            grid = frac + np.arange(-s_before, s_after, dtype=np.float64)
            grid = np.clip(grid, 0, n_s - 1)
            aligned = np.empty((n_ch, len(grid)), dtype=np.float32)
            xs = np.arange(n_s, dtype=np.float64)
            for c in range(n_ch):
                if mode == "cspline":
                    aligned[c] = cubic_spline_eval(w[c], grid).astype(np.float32)
                else:
                    aligned[c] = np.interp(grid, xs, w[c]).astype(np.float32)
            out.append([ch.tolist() for ch in aligned])
        return pd.Series(out)

    return df.withColumn("aligned", align(F.col(waveform_col))).withColumn(
        "n_samples_in", num_samples_col
    ).drop("n_samples_in")
