#!/usr/bin/env python
"""spark-submit entrypoint: resumable image-table validation run.

Cluster launch (north_rule: ``spark-submit --py-files`` on a
multi-executor cluster)::

    zip -r engine.zip anomalydetection_spark
    spark-submit --master yarn --deploy-mode client \
        --py-files engine.zip scripts/run_validation.py \
        --input  s3://bucket/images_table \
        --output s3://bucket/validation_out \
        --bucket-key image_id --n-buckets 256

Local smoke::

    python scripts/run_validation.py --input /tmp/images --output /tmp/out

The run is unit-by-unit resumable: re-launching with the same --output
skips units already committed to the ledger against the same input
snapshot (see anomalydetection_spark/checkpoint.py). Sinks land under
<output>/{verdicts,violations,lineage} as parquet (Iceberg tables in a
catalog deployment — same layout, transactional commit per unit).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="image-table parquet dir")
    ap.add_argument("--output", required=True, help="sink + ledger dir")
    ap.add_argument("--unit-col", default=None,
                    help="partition column to use as resume unit (e.g. fmt)")
    ap.add_argument("--bucket-key", default="image_id",
                    help="hash-bucket key when --unit-col is absent")
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--no-decode", action="store_true",
                    help="skip the decode/PSNR check (metadata-only suite)")
    ap.add_argument("--max-phash-mismatch-rate", type=float, default=None,
                    help="enable the stored-phash consistency gate at this "
                         "tolerance (set >= the table's known hot-key rate)")
    ap.add_argument("--allow-snapshot-change", action="store_true")
    args = ap.parse_args()

    from anomalydetection_spark.checkpoint import CheckpointedRunner
    from anomalydetection_spark.plans.image_suite import build_image_suite
    from anomalydetection_spark.session import get_spark

    spark = get_spark("adspark-run-validation")
    spark.sparkContext.setLogLevel("WARN")

    images = spark.read.parquet(args.input)
    suite = build_image_suite(
        ["jpeg", "png", "webp"], with_decode=not args.no_decode,
        max_phash_mismatch_rate=args.max_phash_mismatch_rate,
    )
    runner = CheckpointedRunner(
        suite,
        out_dir=args.output,
        unit_col=args.unit_col,
        bucket_key=None if args.unit_col else args.bucket_key,
        n_buckets=args.n_buckets,
        allow_snapshot_change=args.allow_snapshot_change,
    )
    report = runner.run(images, input_path=args.input)
    print(json.dumps({
        "snapshot": report.snapshot,
        "units_completed": report.completed,
        "units_resumed": report.resumed,
        "units": [
            {"unit": u.unit, "rows": u.rows, "failed": u.failed,
             "violation_rows": u.violation_rows,
             "elapsed_sec": round(u.elapsed_sec, 3), "skipped": u.skipped}
            for u in report.units
        ],
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
