"""Incremental validation via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10) — its "recency" is a
dropdown over uploaded snapshots. At pipeline scale, new image/caption
files land continuously; this module validates each micro-batch as it
arrives and appends per-batch verdicts/metrics, giving the same
constraint surface as the batch engine with exactly-once progress
tracking delegated to Structured Streaming's checkpoint (offsets + sink
commit log) — the streaming twin of checkpoint.py's batch ledger.

``Trigger.AvailableNow`` turns the same query into a catch-up batch job
(process everything new, then stop) — the recommended pattern for
scheduled incremental validation over a growing Iceberg/parquet table.

foreachBatch is used (not a plain streaming agg) because the suite needs
multi-pass logic (fused stats + post rounds + uniqueness shuffle) that
exceeds what a single streaming aggregation can express; each micro-batch
is a bounded DataFrame so the full batch engine applies unchanged.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from anomalydetection_spark.suite import ValidationSuite


def validate_stream(
    spark: SparkSession,
    input_path: str,
    schema: str,
    suite: ValidationSuite,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Validate a growing parquet directory incrementally.

    Each micro-batch runs the FULL suite on the new files only and
    appends verdicts tagged with the batch id. Restarts resume from the
    streaming checkpoint (no re-validation of processed files).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        res = suite.run(batch_df, spark, with_violations=False)
        (
            res.verdicts.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(f"{out_dir}/verdicts")
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def watermarked_rate_metrics(
    images_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """Per-(window, fmt) arrival metrics with late-data handling — the
    streaming analog of the suite's per-partition metrics rows. Late rows
    beyond the watermark are dropped from their window (documented
    trade-off; the batch suite re-derives exact numbers)."""
    return (
        images_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("time_window"), "fmt")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.avg("w").alias("mean_width"),
            F.sum(F.col("caption").isNull().cast("long")).alias("null_captions"),
        )
    )
