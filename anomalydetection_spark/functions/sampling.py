"""Deterministic corpus splitting/sampling for training pipelines.

Engine ADDITION beyond the reference — the train/val/test assignment and
reproducible-downsampling step every training-data pipeline needs at the
front of the corpus DAG.

Why hash-bucket assignment and not ``df.sample``/``rand()``:

* **Stable under growth** — a document's bucket depends only on its id,
  so re-running the split on a grown corpus keeps every existing row's
  assignment (no train/val leakage when the pipeline is incremental);
* **Engine/cluster independent** — md5 is identical everywhere; `rand()`
  depends on partition layout and seed plumbing, so N and 4N executors
  would disagree;
* **Map-only** — the assignment is a scan-side projection; at 10^12 rows
  nothing shuffles and the split column is computable during ingest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: bucket space; 10^6 gives ppm-granular fractions while keeping the
#: boundary arithmetic exact in int64
_BUCKETS = 1_000_000


def split_bucket(id_col: str = "doc_id", salt: str = "split") -> Column:
    """Deterministic bucket in [0, 10^6): first 15 md5 hex digits of
    ``salt || '_' || id`` as int64, mod 10^6. 15 digits (60 bits) keep
    ``conv`` exact; the same value is reproducible in any engine with
    md5 (DuckDB: positional hex fold — see the gate oracle)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}_"), F.col(id_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("bigint")
    return F.pmod(h, F.lit(_BUCKETS))


def deterministic_split(df: DataFrame, splits: dict[str, float],
                        id_col: str = "doc_id",
                        salt: str = "split") -> DataFrame:
    """Append a ``split`` column assigning each row to one of ``splits``
    (name → fraction, summing to ~1; the LAST split absorbs rounding
    remainder so the assignment is total). Fractions are honored to
    1/10^6. Map-only and idempotent: same (id, salt) → same split,
    forever, on any engine or cluster size. NULL ids hash to a NULL
    bucket and land in the LAST split (the CASE remainder) — malformed
    rows belong to no fraction; flag them upstream with NotNullCheck."""
    fracs = list(splits.values())
    if min(fracs) < 0 or not 0.999 <= sum(fracs) <= 1.001:
        raise ValueError(f"split fractions must be >=0 and sum to ~1: {splits}")
    for name, frac in list(splits.items())[:-1]:
        if frac > 0 and int(round(frac * _BUCKETS)) == 0:
            raise ValueError(
                f"split {name!r} fraction {frac} is below the 1/{_BUCKETS} "
                f"bucket granularity — it would be silently empty")
    b = split_bucket(id_col, salt)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        bound = int(round(acc * _BUCKETS))
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    return df.withColumn(
        "split", last if expr is None else expr.otherwise(last)
    )


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         salt: str = "sample") -> DataFrame:
    """Reproducible ``fraction`` downsample by the same hash-bucket rule:
    keeps exactly the rows whose bucket < fraction·10^6. Unlike
    ``df.sample`` the kept set is a pure function of (id, salt) — stable
    across runs, engines, partitionings, and corpus growth, and the
    predicate is scan-side (map-only). NULL ids are never kept (NULL
    compares unknown) — mirror of deterministic_split's remainder rule."""
    if not 0 < fraction <= 1:
        raise ValueError("fraction must be in (0, 1]")
    bound = int(round(fraction * _BUCKETS))
    return df.filter(split_bucket(id_col, salt) < F.lit(bound))
