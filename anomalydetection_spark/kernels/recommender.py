"""Sparse-Mahalanobis recommender kernel — reference-compat re-expression.

Distributed re-implementation of ``runRecAnalysis``
(``/root/reference/PRIME_App/utils.R:101-296``; SURVEY.md §2.11 K1): score
each row of a sparse wide observation matrix, flag outliers, and estimate
what each observed cell "should have been" via Gaussian conditional means.

Stage map (R loop → Spark):

  1-2. column screens (presence <``min_presence``, zero variance)
       — from ONE fused aggregation               (utils.R:111-122)
  4.   row screen: ≥``min_row_obs`` observed cells — scan predicate (:178-181)
  5.   sparse moments: μ_j = Σx_j/N_j; pairwise-complete cross-products
       S_ij = Σ x_i·x_j over co-observed rows, R_ij = S_ij/√(N_i·N_j)
       — one aggregation of k(k+1)/2 sums + counts   (:186-223)
       COMPAT NOTE (reproduced exactly): R is *uncentered about the
       sparse μ within the products* the way the R code accumulates
       (y−μ) products pairwise-complete then normalizes by √(N_i N_j),
       i.e. S_ij = Σ_co-observed (x_i−μ_i)(x_j−μ_j), R_ij = S_ij/√(N_i N_j)
       — NOT an (n−1)-divisor covariance.
  6.   MD per row = modi::MDmiss semantics: quadratic form on the
       OBSERVED coordinates only (subset μ, R), rescaled by p/p_obs (:228)
  7.   flag: MD > qchisq(alpha, df). ``compat_df_quirk`` reproduces the
       reference bug where df = n_keys + k + 1 (the MD column itself
       counted) minus 1, instead of k                  (:231-232)
  8.   estimates for flagged rows: E[x_j|y] = R_jy R_yy⁻¹ (y−μ_y) + μ_j
       over the OTHER observed cells y; missingness-pattern grouping with
       driver-precomputed inverses (patterns ≪ rows)   (:240-272)
  9.   D_j = |E_j − x_j| / R_jj; output keys + x + E_ + D_ + MD +
       outlier_sp, sorted worst-first                  (:283-292, :38-39)

Scale design: moments are one DataFrame agg (k≈20 → ~210 pair sums);
scoring/estimation is a grouped-map pandas UDF over the missingness
pattern bitmask — per-pattern numpy is vectorized over all rows sharing
the pattern, and R_yy⁻¹ is computed once per pattern, not per row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from anomalydetection_spark.functions.stats_math import chi2_ppf


def sparse_moments(df: DataFrame, cols: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mu, R, N) from one aggregation: sparse means, the reference's
    count-normalized pairwise-complete second-moment matrix, and per-pair
    presence counts (diagonal = per-column presence)."""
    k = len(cols)
    aggs = []
    for i, ci in enumerate(cols):
        aggs.append(F.sum(F.col(ci).cast("double")).alias(f"s_{i}"))
        aggs.append(F.count(F.col(ci)).alias(f"n_{i}"))
    row = df.agg(*aggs).first()
    mu = np.array([
        (row[f"s_{i}"] or 0.0) / row[f"n_{i}"] if row[f"n_{i}"] else np.nan
        for i in range(k)
    ])

    paggs = []
    for i, ci in enumerate(cols):
        di = F.col(ci).cast("double") - F.lit(float(mu[i]))
        for j in range(i, k):
            dj = F.col(cols[j]).cast("double") - F.lit(float(mu[j]))
            both = F.col(ci).isNotNull() & F.col(cols[j]).isNotNull()
            paggs.append(F.sum(F.when(both, di * dj)).alias(f"ss_{i}_{j}"))
            paggs.append(F.sum(both.cast("long")).alias(f"np_{i}_{j}"))
    prow = df.agg(*paggs).first()
    S = np.zeros((k, k))
    N = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            S[i, j] = S[j, i] = prow[f"ss_{i}_{j}"] or 0.0
            N[i, j] = N[j, i] = prow[f"np_{i}_{j}"] or 0
    with np.errstate(divide="ignore", invalid="ignore"):
        R = S / np.sqrt(np.outer(np.diag(N), np.diag(N)))
    return mu, R, N


def screen_columns(df: DataFrame, cols: list[str],
                   min_presence: float = 0.10) -> list[str]:
    """Stages 1-2: drop sparse (<min_presence) and zero-variance columns
    (utils.R:111-122) — one fused aggregation."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"n_{c}"))
        aggs.append(F.var_samp(F.col(c).cast("double")).alias(f"v_{c}"))
    row = df.agg(*aggs).first()
    total = row["__rows"] or 1
    keep = []
    for c in cols:
        present = (row[f"n_{c}"] or 0) / total
        var = row[f"v_{c}"]
        if present >= min_presence and var is not None and var > 0:
            keep.append(c)
    return keep


def run_rec_analysis(
    df: DataFrame,
    keys: list[str],
    indicator_cols: list[str],
    alpha: float = 0.95,
    min_presence: float = 0.10,
    min_row_obs: int = 4,
    compat_df_quirk: bool = True,
    estimates_for_flagged_only: bool = True,
) -> DataFrame:
    """Full K1 pipeline. Returns keys + x + E_/D_ + MD + outlier_sp."""
    cols = screen_columns(df, indicator_cols, min_presence)
    k = len(cols)
    if k == 0:
        raise ValueError("no indicator columns survive the screens")

    # stage 4 row screen — pure scan predicate
    obs_count = sum(F.col(c).isNotNull().cast("int") for c in cols)
    base = df.filter(obs_count >= min_row_obs).select(*keys, *cols)

    mu, R, _N = sparse_moments(base, cols)

    # df quirk: reference passes ncol(frame-with-keys-and-MD) - 1
    dof = (len(keys) + k + 1) - 1 if compat_df_quirk else k
    cutoff = chi2_ppf(alpha, dof)

    # pattern bitmask: which indicator cells are observed
    pattern = sum(
        F.col(c).isNotNull().cast("long") * F.lit(1 << i)
        for i, c in enumerate(cols)
    )
    tagged = base.withColumn("__pattern", pattern)

    out_schema = (
        ", ".join(f"`{c}` {t}" for c, t in
                  [(kcol, dict(base.dtypes)[kcol]) for kcol in keys])
        + ", " + ", ".join(f"`{c}` double" for c in cols)
        + ", " + ", ".join(f"`E_{c}` double" for c in cols)
        + ", " + ", ".join(f"`D_{c}` double" for c in cols)
        + ", MD double, outlier_sp int"
    )

    mu_b = mu.copy()
    R_b = R.copy()
    kk = k
    flagged_only = estimates_for_flagged_only

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        """One missingness pattern: vectorized MDmiss + conditional means.
        R_yy⁻¹ computed ONCE per pattern (utils.R computes per row)."""
        pat = int(pdf["__pattern"].iloc[0])
        obs = [i for i in range(kk) if pat & (1 << i)]
        X = pdf[cols].to_numpy(dtype=float)
        Xo = X[:, obs]
        mo = mu_b[obs]
        Ro = R_b[np.ix_(obs, obs)]
        p_obs = len(obs)
        try:
            Rinv = np.linalg.inv(Ro)
        except np.linalg.LinAlgError:
            Rinv = np.linalg.pinv(Ro)
        d = Xo - mo
        md = np.einsum("ij,jk,ik->i", d, Rinv, d) * (kk / max(p_obs, 1))
        flag = (md > cutoff).astype(int)

        E = np.full_like(X, np.nan)
        D = np.full_like(X, np.nan)
        rows_to_estimate = np.where(flag == 1)[0] if flagged_only else np.arange(len(X))
        for j_pos, j in enumerate(obs):
            others = [o for o in obs if o != j]
            if not others:
                continue
            o_pos = [obs.index(o) for o in others]
            Ryy = R_b[np.ix_(others, others)]
            Rjy = R_b[j, others]
            try:
                Ryy_inv = np.linalg.inv(Ryy)
            except np.linalg.LinAlgError:
                Ryy_inv = np.linalg.pinv(Ryy)
            w = Rjy @ Ryy_inv
            for r in rows_to_estimate:
                y = Xo[r, o_pos] - mu_b[others]
                E[r, j] = float(w @ y + mu_b[j])
                denom = R_b[j, j] if R_b[j, j] else np.nan
                D[r, j] = abs(E[r, j] - X[r, j]) / denom

        out = pdf[keys].copy()
        for i, c in enumerate(cols):
            out[c] = X[:, i]
        for i, c in enumerate(cols):
            out[f"E_{c}"] = E[:, i]
        for i, c in enumerate(cols):
            out[f"D_{c}"] = D[:, i]
        out["MD"] = md
        out["outlier_sp"] = flag
        return out

    scored = tagged.groupBy("__pattern").applyInPandas(score, out_schema)
    return scored.orderBy(F.desc("outlier_sp"), F.desc("MD"))
