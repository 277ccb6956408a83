"""Independent high-fidelity K2 reference forecasters (numpy-only).

The reference app fits ``stlf(method='arima')`` / ``stlf(method='ets')`` /
``auto.arima`` from R's ``forecast`` package (``PRIME_App/utils.R:474-532``).
This container has no R and no statsmodels, so the ENGINE ships
deterministic fixed-parameter analogs (``kernels/timeseries.py``). This
module is the measuring stick for the numeric-gap study
(``test_k2_fidelity.py``): an INDEPENDENT implementation that is strictly
closer to the R algorithms than the engine's analogs —

* **loess-STL**: seasonal-trend decomposition with s.window='periodic'
  cycle-subseries and a degree-1 tricube-weighted LOESS trend (the real
  STL inner loop, iterated). Unlike the engine's centered-MA classical
  decomposition, the loess trend covers the series ENDS — exactly the
  region that drives the h=1 forecast.
* **optimized ETS**: SES (A,N,N) and Holt (A,A,N) with smoothing
  parameters chosen by grid-optimized SSE and model selection by AICc —
  the shape of ``ets()``'s maximum-likelihood fit, vs the engine's fixed
  (alpha=0.3, beta=0.1).
* **AICc-selected AR + drift** on the seasonally-differenced series with
  p in {0, 1, 2} — ``auto.arima(seasonal=TRUE, max.p=2)``'s AR subset
  (the MA half of the search is not replicated; restriction documented
  in BASELINE.md).

All forecasters return (pred, sd) with the 99% PI = pred ± z_.995 · sd,
matching the engine's band rule so only MODEL fidelity differs.
"""

from __future__ import annotations

import numpy as np

Z99 = 2.5758293035489004


# --------------------------------------------------------------- loess

def _loess(y: np.ndarray, span: float = 0.6, degree: int = 1) -> np.ndarray:
    """Degree-1 LOESS with tricube weights evaluated at every index."""
    n = len(y)
    q = max(int(np.ceil(span * n)), degree + 2)
    q = min(q, n)
    x = np.arange(n, dtype=float)
    out = np.empty(n)
    for i in range(n):
        d = np.abs(x - i)
        idx = np.argsort(d)[:q]
        dmax = d[idx].max() or 1.0
        w = (1 - (d[idx] / dmax) ** 3) ** 3
        w = np.clip(w, 0.0, None)
        X = np.vstack([np.ones(q), x[idx] - i]).T
        W = np.diag(w)
        beta, *_ = np.linalg.lstsq(W @ X, w * y[idx], rcond=None)
        out[i] = beta[0]
    return out


def stl_periodic(y: np.ndarray, m: int, iters: int = 2):
    """STL with s.window='periodic': seasonal = per-season mean of the
    detrended series (re-centered), trend = loess of the deseasonalized
    series; iterated. Returns (seasonal_full, trend, adjusted)."""
    n = len(y)
    trend = _loess(y, span=0.8)
    seasonal = np.zeros(n)
    for _ in range(iters):
        detr = y - trend
        seas_idx = np.array([
            detr[np.arange(n) % m == s].mean() for s in range(m)
        ])
        seas_idx -= seas_idx.mean()
        seasonal = seas_idx[np.arange(n) % m]
        trend = _loess(y - seasonal, span=0.6)
    return seasonal, trend, y - seasonal


# --------------------------------------------------------------- ETS

def _ses_sse(a: np.ndarray, alpha: float):
    level = a[0]
    resid = []
    for t in range(1, len(a)):
        resid.append(a[t] - level)
        level = alpha * a[t] + (1 - alpha) * level
    return level, np.array(resid)


def _holt_sse(a: np.ndarray, alpha: float, beta: float):
    level, trend = a[0], a[1] - a[0]
    resid = []
    for t in range(1, len(a)):
        pred = level + trend
        resid.append(a[t] - pred)
        new_level = alpha * a[t] + (1 - alpha) * pred
        trend = beta * (new_level - level) + (1 - beta) * trend
        level = new_level
    return level + trend, np.array(resid)


def _aicc(sse: float, n: int, k: int) -> float:
    if n - k - 1 <= 0:
        return np.inf
    return n * np.log(max(sse, 1e-12) / n) + 2 * k * n / (n - k - 1)


def ets_optimized(a: np.ndarray) -> tuple[float, float]:
    """AICc-selected, SSE-grid-optimized SES / Holt h=1 forecast."""
    n = len(a)
    grid = np.arange(0.05, 1.0, 0.05)
    best = (np.inf, float(a[-1]), 0.0)
    for alpha in grid:
        pred, resid = _ses_sse(a, alpha)
        sse = float(resid @ resid)
        score = _aicc(sse, len(resid), k=2)       # alpha + level0
        sd = np.sqrt(sse / max(len(resid) - 1, 1))
        if score < best[0]:
            best = (score, float(pred), float(sd))
    for alpha in grid:
        for beta in grid[grid <= alpha]:           # usual beta<=alpha region
            pred, resid = _holt_sse(a, alpha, beta)
            sse = float(resid @ resid)
            score = _aicc(sse, len(resid), k=4)    # alpha, beta, level0, trend0
            sd = np.sqrt(sse / max(len(resid) - 1, 1))
            if score < best[0]:
                best = (score, float(pred), float(sd))
    return best[1], max(best[2], 1e-9)


# --------------------------------------------------------------- AR(p)

def ar_aicc(d: np.ndarray, max_p: int = 2) -> tuple[float, float]:
    """AR(p)+drift OLS fit with p selected by AICc; h=1 forecast + sd."""
    n = len(d)
    best = (np.inf, float(np.mean(d)),
            float(np.std(d, ddof=1)) if n > 1 else 0.0)
    for p in range(0, max_p + 1):
        if n - p < p + 3:
            continue
        if p == 0:
            resid = d - np.mean(d)
            pred = float(np.mean(d))
            k = 1
        else:
            X = np.vstack([np.ones(n - p)] +
                          [d[p - j - 1:n - j - 1] for j in range(p)]).T
            yv = d[p:]
            beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
            resid = yv - X @ beta
            lastx = np.concatenate([[1.0], d[::-1][:p]])
            pred = float(lastx @ beta)
            k = p + 1
        sse = float(resid @ resid)
        score = _aicc(sse, len(resid), k)
        sd = float(np.sqrt(sse / max(len(resid) - k, 1)))
        if score < best[0]:
            best = (score, pred, sd)
    return best[1], max(best[2], 1e-9)


# --------------------------------------------------------- top-level API

def ref_stl_forecast(y: np.ndarray, m: int, method: str) -> tuple[float, float]:
    """stlf analog at reference fidelity: loess-STL decompose, forecast
    the adjusted series (optimized ETS or AICc-AR), re-add the target
    period's seasonal index."""
    if len(y) < 2 * m + 1:
        d = np.diff(y)
        sd = float(np.std(d, ddof=1)) if len(d) > 1 else 1e-9
        return float(y[-1] + (d.mean() if len(d) else 0.0)), max(sd, 1e-9)
    seasonal, _trend, adj = stl_periodic(y, m)
    # seasonal is periodic — index the target period within one cycle
    target_seas = float(seasonal[:m][len(y) % m])
    if method == "ets":
        pred_a, sd = ets_optimized(adj)
    else:  # 'arima': AICc-AR on the adjusted series
        pred_a, sd = ar_aicc(np.diff(adj), max_p=2)
        pred_a = float(adj[-1] + pred_a)
    return float(pred_a + target_seas), max(sd, 1e-9)


def ref_auto_arima(y: np.ndarray, m: int) -> tuple[float, float]:
    """auto.arima(seasonal=TRUE) AR-subset analog: seasonal difference,
    AICc-selected AR(p)+drift, h=1."""
    if len(y) <= m + 3:
        d = np.diff(y)
        sd = float(np.std(d, ddof=1)) if len(d) > 1 else 1e-9
        return float(y[-1] + (d.mean() if len(d) else 0.0)), max(sd, 1e-9)
    d = y[m:] - y[:-m]
    pred_d, sd = ar_aicc(d, max_p=2)
    return float(y[-m] + pred_d), max(sd, 1e-9)


def ref_flags(y_hist: np.ndarray, actual: float, m: int,
              min_thresh: float = 0.0) -> dict[str, dict]:
    """Reference-fidelity verdicts for all three models on one series."""
    out = {}
    for model, (pred, sd) in {
        "stl_arima": ref_stl_forecast(y_hist, m, "arima"),
        "stl_ets": ref_stl_forecast(y_hist, m, "ets"),
        "arima": ref_auto_arima(y_hist, m),
    }.items():
        lo, hi = pred - Z99 * sd, pred + Z99 * sd
        outside = actual < lo or actual > hi
        out[model] = {
            "pred": pred, "sd": sd, "lo99": lo, "hi99": hi,
            "outlier": int(outside and abs(actual - pred) > min_thresh),
        }
    return out
