"""Small pure-python statistical math (no scipy in the runtime).

Provides the χ² inverse-CDF the reference gets from ``qchisq``
(``/root/reference/PRIME_App/utils.R:231``: MD cutoff
``qchisq(.95, df)``).  Values are driver-side constants folded into Spark
expressions — never evaluated per row.

Implementation: regularized lower incomplete gamma P(a, x) via its series
expansion (x < a+1) and continued fraction (x ≥ a+1) — the standard
Lentz/NR formulation — then bisection for the inverse.  Accurate to ~1e-12,
cross-checked against R's qchisq in tests/test_stats_math.py.
"""

from __future__ import annotations

import math

_MAX_ITER = 500
_TINY = 1e-300


def _gammainc_series(a: float, x: float) -> float:
    ap = a
    summ = 1.0 / a
    delta = summ
    for _ in range(_MAX_ITER):
        ap += 1.0
        delta *= x / ap
        summ += delta
        if abs(delta) < abs(summ) * 1e-15:
            break
    return summ * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gammainc_cf(a: float, x: float) -> float:
    b = x + 1.0 - a
    c = 1.0 / _TINY
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _TINY:
            d = _TINY
        c = b + an / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    return math.exp(-x + a * math.log(x) - math.lgamma(a)) * h


def gammainc_lower(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("gammainc_lower requires x >= 0, a > 0")
    if x == 0:
        return 0.0
    if x < a + 1.0:
        return _gammainc_series(a, x)
    return 1.0 - _gammainc_cf(a, x)


def chi2_cdf(x: float, df: float) -> float:
    return gammainc_lower(df / 2.0, x / 2.0)


def chi2_ppf(p: float, df: float) -> float:
    """Inverse χ² CDF by bisection (driver-side constant; speed irrelevant)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0,1)")
    lo, hi = 0.0, df + 10.0
    while chi2_cdf(hi, df) < p:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if chi2_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-12 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)
