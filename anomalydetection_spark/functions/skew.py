"""Skew handling: heavy-hitter detection + salted two-level aggregation.

The reference has no notion of skew (single process; SURVEY.md §4.1).
At 10^12 rows our hot keys are known from the data model: ``phash`` has
heavy hitters (near-identical crops/resizes collapse to one hash) and
``fmt`` is ~80% jpeg. Two mitigations, chosen by aggregation type:

* **Combinable aggs** (count/sum/min/max/HLL): Spark's partial
  aggregation already combines per map task — a hot key ships ONE
  partial row per task. Salting would only add a shuffle. Do nothing.
* **Non-combinable shapes** (collect_list, exact-distinct-per-key,
  joins keyed on the hot column): pre-salt with
  ``pmod(xxhash64(row_key), S)`` so one reducer key becomes S keys, then
  merge the S partials. ``salted_group_count`` implements the canonical
  two-level count; AQE's ``skewJoin`` covers the join case at runtime.

Heavy hitters are detected with a cheap sampled pre-pass
(``heavy_hitters``) — at 10^12 rows a 10^-4 sample bounds any key with
>0.1% mass with high probability, and the result is a tiny broadcastable
dimension driving the salt-or-not decision per key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def heavy_hitters(df: DataFrame, key: str, min_share: float = 0.001,
                  sample_fraction: float | None = None,
                  total_rows: int | None = None) -> DataFrame:
    """(key, est_share) for keys holding ≥min_share of sampled rows.

    Sampled pre-pass: one narrow scan of ``sample_fraction`` rows (auto:
    aims at ~1M sampled rows), map-side combined — the output is at most
    1/min_share rows, always broadcastable.

    Denominator/job shape (shares are estimates either way — binomial
    sampling noise dominates):

    * ``total_rows`` given — zero pre-pass jobs: expected sample size
      ``total_rows × fraction``. Pass it when the caller already knows
      the count (ledger, earlier agg, table metadata) — the only shape
      with NO extra evaluation of a derived input.
    * auto fraction — one ``df.count()`` sizes the sample (metadata-only
      on raw parquet scans; a full evaluation on derived frames).
    * explicit fraction, no total — realized sample size via one count
      of the sample. NOTE: sampling is a filter, not a scan-pruner, so
      this still evaluates the upstream plan once more (same input cost
      as the agg pass); it exists for callers that can't supply
      ``total_rows``, not as a free lunch."""
    if total_rows is not None:
        if sample_fraction is None:
            sample_fraction = min(1.0, 1_000_000 / max(total_rows, 1))
        n_est = max(float(total_rows) * sample_fraction, 1.0)
        s = df.sample(fraction=sample_fraction, seed=42).select(key)
    elif sample_fraction is None:
        total = df.count()  # metadata-only on raw parquet scans
        sample_fraction = min(1.0, 1_000_000 / max(total, 1))
        n_est = max(float(total) * sample_fraction, 1.0)
        s = df.sample(fraction=sample_fraction, seed=42).select(key)
    else:
        s = df.sample(fraction=sample_fraction, seed=42).select(key)
        n_est = max(float(s.count()), 1.0)
    return (
        s.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("est_share", F.col("cnt") / F.lit(n_est))
        .filter(F.col("est_share") >= min_share)
        .drop("cnt")
    )


def salted_group_count(df: DataFrame, keys: list[str], n_salt: int = 32,
                       salt_source: str | None = None) -> DataFrame:
    """Exact per-key counts via two-level salted aggregation.

    Level 1 shuffles on (keys, salt) — a hot key's rows spread over
    ``n_salt`` reducers; level 2 merges the ≤n_salt partials per key (a
    shuffle of #distinct_keys × n_salt tiny rows). Result is identical
    to ``groupBy(keys).count()``; use when the plain count's reducer for
    a hot key would exceed task memory/time budgets (non-combinable
    payloads, or extreme single-key mass)."""
    salt_col = F.pmod(
        F.xxhash64(*(F.col(c) for c in (salt_source and [salt_source] or keys)), F.monotonically_increasing_id()),
        F.lit(n_salt),
    )
    lvl1 = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return lvl1.groupBy(*keys).agg(F.sum("__partial").alias("count"))
