"""Composed relational operators Spark lacks as primitives: as-of join,
sessionization.

Engine ADDITIONS beyond the reference (its only non-equi logic is a
post-join band filter — SURVEY.md §2.3), built strictly as compositions
of DataFrame primitives per the build brief's custom-operator ladder
(composition first, pandas UDF only if semantics demand it — they don't
here).

* ``asof_join`` — "latest right-side value at-or-before each left row"
  without a range-join explosion: tag both sides, union, one ordered
  window with ``last(ignorenulls)``. One shuffle on (by, on); a
  hot ``by`` key is AQE-splittable since the window partitions by key.
* ``sessionize`` — gap-based session ids per key: lag + cumulative sum
  over one ordered window. The batch twin of streaming session windows
  (``F.session_window`` covers the streaming case).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
) -> DataFrame:
    """For each left row, attach the latest right row's ``right_cols``
    with ``right.on <= left.on`` within the same ``by`` group (NULL when
    no prior right row exists).

    ``right_cols`` must not collide with left column names. Rows of the
    two sides tied on ``on`` count as "at or before" (right sorts first).
    With duplicate (by, on) pairs on the right, which tied row wins is
    unspecified — pass a unique (by, on) right side when that matters.

    The right columns travel as ONE struct through a single
    ``last(ignorenulls)`` window: all attached values come from the same
    matched right row (per-column fills could mix rows when a right row
    holds NULLs), a genuine NULL inside the matched row survives, and W
    right columns cost one window pass instead of W.
    """
    by = list(by)
    right_cols = list(right_cols)
    if not right_cols:
        # struct() with zero fields is invalid; an as-of join attaching
        # nothing is a caller bug — fail loudly instead
        raise ValueError("asof_join: right_cols must name ≥1 column to attach")
    l = left.withColumn("__side", F.lit(1))
    r = right.select(*by, on, *right_cols).withColumn("__side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # struct is non-NULL exactly on right rows, so ignorenulls skips left
    # rows and picks the latest right row as a unit
    packed = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in right_cols])
    )
    u = u.withColumn("__r", F.last(packed, ignorenulls=True).over(w))
    return (
        u.filter(F.col("__side") == 1)
        .select(
            *[c for c in u.columns if c not in {"__side", "__r", *right_cols}],
            *[F.col(f"__r.{c}").alias(c) for c in right_cols],
        )
    )


def sessionize(
    events: DataFrame,
    by: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event in the same ``by`` group exceeds
    ``gap_seconds``. Adds ``session_id`` (1-based per group).

    Time math runs on integer microseconds (``unix_micros``) so an
    independent engine (DuckDB ``epoch_us``) reproduces the session
    boundaries exactly. ``order_tiebreak`` names a unique column to make
    the ordering total when timestamps can tie."""
    by = list(by)
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(*by).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))  # NTZ→UTC (session tz is UTC)
    prev = F.lag(us).over(w)
    gap_us = int(gap_seconds * 1_000_000)
    new_session = (prev.isNull() | ((us - prev) > F.lit(gap_us))).cast("long")
    cum = Window.partitionBy(*by).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(new_session).over(cum))
