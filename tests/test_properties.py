"""Property-based tests (SURVEY.md §5.2) over the engine's pure kernels.

Hypothesis drives the pure-python/numpy layers (cheap per example); the
Spark-level invariance properties (verdicts identical under repartition,
salted == unsalted) live in test_images.py / test_plans.py where one
example is already expensive.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from anomalydetection_spark.checks.drift import (
    emd_from_histograms,
    ks_from_histograms,
    psi_from_histograms,
    _normalize,
)
from anomalydetection_spark.functions.stats_math import chi2_cdf, chi2_ppf
from anomalydetection_spark.functions.image_ops import nn_resize
from anomalydetection_spark.functions.png import decode_png, encode_png
from anomalydetection_spark.kernels.timeseries import (
    _ar1_drift,
    _holt_winters,
    _interp,
    _snaive,
)

FAST = settings(max_examples=60, deadline=None)


# ---------------------------------------------------------------- chi² math

@FAST
@given(p=st.floats(0.01, 0.99), df=st.floats(1.0, 60.0))
def test_chi2_ppf_cdf_roundtrip(p, df):
    x = chi2_ppf(p, df)
    assert x > 0
    assert abs(chi2_cdf(x, df) - p) < 1e-9


@FAST
@given(df=st.floats(1.0, 60.0), p1=st.floats(0.05, 0.5), p2=st.floats(0.5, 0.95))
def test_chi2_ppf_monotone(df, p1, p2):
    assert chi2_ppf(p1, df) <= chi2_ppf(p2, df) + 1e-12


# ---------------------------------------------------------------- drift math

hist = st.lists(st.integers(0, 1000), min_size=4, max_size=32)


@FAST
@given(h=hist)
def test_psi_ks_self_zero(h):
    n = len(h)
    counts = {i: c for i, c in enumerate(h)}
    p = _normalize(counts, n)
    assert psi_from_histograms(p, p) < 1e-12
    assert ks_from_histograms(p, p) == 0.0
    assert emd_from_histograms(p, p) == 0.0


@FAST
@given(a=hist, b=hist)
def test_psi_nonneg_ks_bounded(a, b):
    n = max(len(a), len(b))
    p = _normalize({i: c for i, c in enumerate(a)}, n)
    q = _normalize({i: c for i, c in enumerate(b)}, n)
    assert psi_from_histograms(p, q) >= 0.0
    ks = ks_from_histograms(p, q)
    assert 0.0 <= ks <= 1.0 + 1e-12
    # symmetry of the binned KS statistic
    assert abs(ks - ks_from_histograms(q, p)) < 1e-12
    emd = emd_from_histograms(p, q)
    assert emd >= 0.0
    assert abs(emd - emd_from_histograms(q, p)) < 1e-12
    # KS lower-bounds EMD-in-bin-units (max gap <= sum of gaps)
    assert emd >= ks - 1e-12


# ---------------------------------------------------------------- PNG codec

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@settings(max_examples=25, deadline=None)
@given(dims=dims, seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_identity(dims, seed):
    w, h = dims
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@settings(max_examples=25, deadline=None)
@given(dims=dims, out=dims, seed=st.integers(0, 2**31 - 1))
def test_nn_resize_shape_and_value_provenance(dims, out, seed):
    w, h = dims
    ow, oh = out
    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    small = nn_resize(px, ow, oh)
    assert small.shape == (oh, ow, 3)
    # nearest-neighbor: every output pixel is an input pixel
    flat_in = {bytes(v) for v in px.reshape(-1, 3)}
    assert all(bytes(v) in flat_in for v in small.reshape(-1, 3))


# ------------------------------------------------------------- TS forecasts

series = st.lists(
    st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
    min_size=6, max_size=48,
)


@FAST
@given(y=series, m=st.integers(1, 6))
def test_forecasters_finite_with_positive_bands(y, m):
    arr = np.asarray(y, dtype=float)
    for fn in (_snaive, _holt_winters, _ar1_drift):
        pred, sd = fn(arr, m)
        assert math.isfinite(pred) and math.isfinite(sd)
        assert sd > 0  # _sd_floor: bands never collapse to zero width


@FAST
@given(y=series, m=st.integers(1, 6), shift=st.floats(-1e5, 1e5, allow_nan=False))
def test_snaive_shift_equivariance(y, m, shift):
    arr = np.asarray(y, dtype=float)
    p0, _ = _snaive(arr, m)
    p1, _ = _snaive(arr + shift, m)
    assert abs((p1 - p0) - shift) < 1e-6 * max(1.0, abs(shift), abs(p0))


@FAST
@given(
    y=st.lists(st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
               min_size=2, max_size=40),
    gaps=st.sets(st.integers(0, 39), max_size=20),
)
def test_interp_preserves_observed_and_fills_gaps(y, gaps):
    arr = np.asarray(y, dtype=float)
    holes = sorted(g for g in gaps if 0 < g < len(arr) - 1)  # keep endpoints
    with_nans = arr.copy()
    with_nans[holes] = np.nan
    out = _interp(with_nans)
    assert not np.isnan(out).any()
    observed = [i for i in range(len(arr)) if i not in holes]
    assert np.array_equal(out[observed], arr[observed])
    # interpolated values stay within the observed envelope (linear interp)
    assert out.min() >= arr[observed].min() - 1e-9
    assert out.max() <= arr[observed].max() + 1e-9


# ------------------------------------------------- pigeonhole segment math

def _segments(sig: int, bits: int, k: int) -> list[tuple[int, int]]:
    """Reference replica of the (seg, val) split used by
    simhash_near_pairs / hamming_near_pairs."""
    nseg = k + 1
    bounds = [bits * j // nseg for j in range(nseg + 1)]
    u = sig & ((1 << bits) - 1)
    return [
        (j, (u >> bounds[j]) & ((1 << (bounds[j + 1] - bounds[j])) - 1))
        for j in range(nseg)
    ]


@FAST
@given(
    sig=st.integers(-(1 << 63), (1 << 63) - 1),
    k=st.integers(0, 6),
    flips=st.lists(st.integers(0, 63), max_size=6, unique=True),
)
def test_pigeonhole_invariant_64bit(sig, k, flips):
    """A pair within k bit flips MUST share at least one exact segment
    (the recall-1.0 guarantee of the bucketed near-dup joins); beyond k
    flips sharing is allowed but never required."""
    other = sig
    for b in flips:
        other ^= 1 << b
    a, b_ = _segments(sig, 64, k), _segments(other, 64, k)
    shared = any(x == y for x, y in zip(a, b_))
    if len(flips) <= k:
        assert shared
    # verify stage would reject far pairs regardless, so no assert else


@FAST
@given(
    v=st.lists(st.floats(-1e6, 1e6, allow_nan=False, width=32),
               min_size=1, max_size=64),
)
def test_quantization_codec_bounds(v):
    """Symmetric int8 codec: |q| ≤ 127 and per-element reconstruction
    error ≤ scale/2 (numpy replica of quantize_embeddings)."""
    x = np.array(v, dtype=np.float64)
    amax = np.abs(x).max()
    scale = amax / 127.0 if amax > 0 else 1.0
    q = np.floor(np.abs(x) / scale + 0.5) * np.sign(x)  # round half away
    assert np.abs(q).max() <= 127
    err = np.abs(q * scale - x)
    assert err.max() <= scale / 2 + 1e-9 * max(1.0, amax)
