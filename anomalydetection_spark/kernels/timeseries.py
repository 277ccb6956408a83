"""Per-series forecast-band outlier kernel — reference-compat re-expression.

Distributed re-implementation of ``runTimeSeries``
(``/root/reference/PRIME_App/utils.R:426-724``; SURVEY.md §2.11 K2): per
(series keys) quarterly series, regularize the time grid, impute interior
gaps, fit three forecasters on the history excluding the final period,
and flag that final observation when it falls outside the 99% prediction
interval AND deviates more than ``min_thresh``.

Stage map (R nested split() loops → ONE grouped-map pandas UDF):

  1. calendar-shell left join (expand.grid + merge, utils.R:437-466)
     → in-kernel reindex over the [min_period, analysis_period] grid
  2. na.trim(sides='left') + na_interpolation(linear) (:469-471)
  3. three h=1 forecasts with 99% PIs (:474-532). The reference fits
     stlf-ARIMA / stlf-ETS / auto.arima from the `forecast` package;
     this engine ships dependency-free deterministic analogs with the
     same decomposition structure (seasonal + trend + innovation):
       * ``snaive``  — seasonal naive, PI from seasonal-diff residuals
       * ``hw``      — additive Holt-Winters (fixed smoothing), PI from
                        one-step in-sample residuals
       * ``ar1``     — AR(1)-with-drift on the deseasonalized series
     ``compat_pred_reuse=True`` reproduces the reference bug where the
     ARIMA branch reports the preceding stlf forecast's point estimate
     (utils.R:535) — our third model's point pred is overwritten by the
     first's.
  4. outlier iff actual present ∧ outside [lo99, hi99] ∧ |actual−pred| >
     min_thresh (:493-497); deviation = gap/(hi−lo) (:581-588)
  5. eligibility gate: ≥``min_recent`` of the last 12 periods present
     (server.R:2128-2137)

Scale design: each series is packed to ONE row (Spark groupBy sum →
collect_list of (period, value) structs — partial-aggregated map-side),
then ``mapInPandas`` scores a whole Arrow batch of series per Python
call. With millions of tiny series, per-group pandas construction is the
dominant cost of the naive grouped ``applyInPandas``; packing makes the
Python overhead per-batch instead of per-series (measured 3× on 7.5k
series). One shuffle total; zero Python in any other stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

Z99 = 2.5758293035489004  # qnorm(.995) — 99% two-sided interval


def _interp(y: np.ndarray) -> np.ndarray:
    """Left-trim is handled by caller; linear-interpolate interior NaNs
    (imputeTS::na_interpolation analog)."""
    idx = np.arange(len(y))
    ok = ~np.isnan(y)
    return np.interp(idx, idx[ok], y[ok])


def _sd_floor(pred: float, sd: float) -> float:
    """Forecast sds never collapse to zero (a perfectly regular history
    still has estimation uncertainty; a zero-width band would flag every
    continuation of an exact pattern)."""
    return max(sd, 1e-9, 1e-6 * max(1.0, abs(pred)))


def _snaive(y: np.ndarray, m: int) -> tuple[float, float]:
    """Seasonal-naive-with-drift point forecast + residual sd (the
    stlf-style trend+seasonal structure: one seasonal lag plus the mean
    seasonal change)."""
    if len(y) <= m:
        pred = float(y[-1])
        sd = float(np.std(np.diff(y), ddof=1)) if len(y) > 2 else 0.0
        return pred, _sd_floor(pred, sd)
    sdiff = y[m:] - y[:-m]
    drift = float(np.mean(sdiff))
    pred = float(y[-m] + drift)
    resid = sdiff - drift
    sd = float(np.std(resid, ddof=1)) if len(resid) > 1 else 0.0
    return pred, _sd_floor(pred, sd)


def _holt_winters(y: np.ndarray, m: int, a: float = 0.3, b: float = 0.1,
                  g: float = 0.2) -> tuple[float, float]:
    """Additive Holt-Winters with fixed smoothing; one-step residual sd."""
    n = len(y)
    if n < 2 * m:
        return _snaive(y, m)
    level = float(np.mean(y[:m]))
    trend = float((np.mean(y[m:2 * m]) - np.mean(y[:m])) / m)
    season = list(y[:m] - level)
    resid = []
    for t in range(m, n):
        s = season[t % m]
        pred = level + trend + s
        resid.append(y[t] - pred)
        new_level = a * (y[t] - s) + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        season[t % m] = g * (y[t] - new_level) + (1 - g) * s
        level = new_level
    pred = level + trend + season[n % m]
    sd = float(np.std(resid, ddof=1)) if len(resid) > 1 else 0.0
    return float(pred), _sd_floor(float(pred), sd)


def _ar1_drift(y: np.ndarray, m: int) -> tuple[float, float]:
    """AR(1)+drift on the seasonal-difference (auto.arima-lite)."""
    if len(y) <= m + 2:
        return _snaive(y, m)
    d = y[m:] - y[:-m]  # seasonal difference
    if len(d) < 3 or np.allclose(d[:-1].var(), 0):
        pred_d, sd = float(np.mean(d)), float(np.std(d, ddof=1) if len(d) > 1 else 0)
    else:
        x, yy = d[:-1], d[1:]
        phi = float(np.cov(x, yy, ddof=1)[0, 1] / np.var(x, ddof=1)) if np.var(x, ddof=1) else 0.0
        phi = max(min(phi, 0.99), -0.99)
        c = float(np.mean(yy) - phi * np.mean(x))
        resid = yy - (c + phi * x)
        pred_d = c + phi * d[-1]
        sd = float(np.std(resid, ddof=1)) if len(resid) > 1 else 0.0
    pred = float(y[-m] + pred_d)
    return pred, _sd_floor(pred, sd)


MODELS = ("snaive", "hw", "ar1")


def run_time_series(
    df: DataFrame,
    keys: list[str],
    period_col: str,
    value_col: str,
    season: int = 4,
    min_thresh: float = 0.0,
    min_recent: int = 10,
    recent_window: int = 12,
    compat_pred_reuse: bool = False,
) -> DataFrame:
    """Flag the latest period per series when outside all-model 99% bands.

    Output: keys + (model, period, actual, pred, lo99, hi99, outlier,
    deviation); one row per (series, model)."""
    analysis_period = df.agg(F.max(period_col)).first()[0]
    key_types = dict(df.dtypes)
    out_cols = list(keys) + ["model", "period", "actual", "pred",
                             "lo99", "hi99", "outlier", "deviation"]
    out_schema = (
        ", ".join(f"`{c}` {key_types[c]}" for c in keys)
        + ", model string, period int, actual double, pred double, "
        + "lo99 double, hi99 double, outlier int, deviation double"
    )

    def score_series(periods_arr: np.ndarray, values: np.ndarray,
                     keyvals: dict) -> list[dict]:
        s = pd.Series(values, index=periods_arr).reindex(
            range(int(periods_arr.min()), analysis_period + 1)
        )
        y_full = s.to_numpy(dtype=float)
        periods = s.index.to_numpy()
        # eligibility: ≥min_recent of the last recent_window periods
        recent = y_full[-recent_window:]
        if np.sum(~np.isnan(recent)) < min_recent:
            return []
        actual = y_full[-1]
        hist = y_full[:-1]
        ok = np.where(~np.isnan(hist))[0]
        hist = hist[ok[0]:]  # na.trim left
        hist = _interp(hist)
        fits = {
            "snaive": _snaive(hist, season),
            "hw": _holt_winters(hist, season),
            "ar1": _ar1_drift(hist, season),
        }
        if compat_pred_reuse:  # utils.R:535 — arima reports stlf's mean
            fits["ar1"] = (fits["snaive"][0], fits["ar1"][1])
        rows = []
        for model in MODELS:
            pred, sd = fits[model]
            lo, hi = pred - Z99 * sd, pred + Z99 * sd
            if np.isnan(actual):
                outlier, dev = 0, np.nan
            else:
                outside = actual < lo or actual > hi
                outlier = int(outside and abs(actual - pred) > min_thresh)
                width = (hi - lo) or np.nan
                gap = max(lo - actual, actual - hi, 0.0)
                dev = gap / width if width == width else np.nan
            rows.append({**keyvals, "model": model, "period": int(periods[-1]),
                         "actual": None if np.isnan(actual) else float(actual),
                         "pred": float(pred), "lo99": float(lo), "hi99": float(hi),
                         "outlier": outlier,
                         "deviation": None if dev != dev else float(dev)})
        return rows

    def fit_batches(batches):
        for pdf in batches:
            rows: list[dict] = []
            for i in range(len(pdf)):
                series = pdf["__series"].iloc[i]
                p = np.fromiter((e["p"] for e in series), dtype=np.int64,
                                count=len(series))
                v = np.array([e["v"] for e in series], dtype=float)
                keyvals = {c: pdf[c].iloc[i] for c in keys}
                rows.extend(score_series(p, v, keyvals))
            yield pd.DataFrame(rows, columns=out_cols)

    # Pack each series into ONE row before any Python: the per-period sum
    # is a partial-aggregating Spark groupBy (duplicate (key, period) rows
    # collapse map-side), and collect_list ships each series as a single
    # Arrow struct array. mapInPandas then scores a whole batch of series
    # per call — per-GROUP pandas/Arrow overhead (the cost that dominates
    # grouped applyInPandas with tiny groups) becomes per-BATCH.
    packed = (
        df.groupBy(*keys, F.col(period_col).cast("int").alias("__p"))
        .agg(F.sum(F.col(value_col).cast("double")).alias("__v"))
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list(
            F.struct(F.col("__p").alias("p"), F.col("__v").alias("v"))
        )).alias("__series"))
    )
    return packed.mapInPandas(fit_batches, out_schema)


def scorecard(outliers: DataFrame, entity_cols: list[str],
              indicator_col: str, count_col: str = "Outliers") -> DataFrame:
    """K3 ``createScoreCard`` re-expression (PRIME_App/utils.R:381-407):
    entity × indicator outlier-count matrix via pivot, zero-filled, with
    a ``Total`` column (row-wise sum, A9) and an appended ``Total`` row
    (column sums, A8/U4). One pivot aggregation + a one-row global agg —
    the reference's rowSums/colSums/rbind sequence collapses into plan
    nodes."""
    base = (
        outliers.groupBy(*entity_cols)
        .pivot(indicator_col)
        .sum(count_col)
        .fillna(0)
    )
    ind_cols = [c for c in base.columns if c not in entity_cols]
    with_total = base.withColumn(
        "Total", sum(F.col(c) for c in ind_cols)
    )
    totals = with_total.agg(
        *[F.sum(c).alias(c) for c in ind_cols + ["Total"]]
    )
    for e in entity_cols:
        totals = totals.withColumn(e, F.lit("Total"))
    return with_total.unionByName(totals.select(*with_total.columns))


def model_agreement(scored: DataFrame, keys: list[str]) -> DataFrame:
    """3-way model agreement per series (the reference's full-outer join
    of ARIMA/ETS/STL outlier tables, utils.R:636-651 — here a pivot)."""
    return (
        scored.groupBy(*keys)
        .pivot("model", list(MODELS))
        .agg(F.first("outlier"))
        .fillna(0, subset=list(MODELS))
        .withColumn("Outliers", sum(F.col(m) for m in MODELS))
    )
