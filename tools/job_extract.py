#!/usr/bin/env python
"""spark-submit entrypoint for the extraction job (north rule:
"run via spark-submit --py-files on a multi-executor cluster").

    spark-submit --py-files smartglass_ocr_spark.zip \
        tools/job_extract.py --input <docs parquet/iceberg path> \
        --output <dir> --checkpoint <dir> --metrics <dir> \
        --run-id r1 [--partitions 64] [--flat]

Resume needs no flag: re-running with the same --checkpoint skips
partitions already marked complete (left-anti join in
checkpoint.run_extraction_job) and overwrites only its own output
partitions. ``--flat`` derives the spans corpus from a flat
(doc_id, text) table; omit it for a spans-shaped input.

On a cluster nothing changes except the master/conf flags; here the
session defaults come from smartglass_ocr_spark.session (the module
resolves from --py-files on executors — UDF imports are deferred to
call time for exactly that reason).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--flat", action="store_true",
                    help="input is the flat (doc_id, text) table; derive spans")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from smartglass_ocr_spark.checkpoint import run_extraction_job

    spark = SparkSession.builder.appName("smartglass-extract").getOrCreate()
    docs = spark.read.parquet(args.input)
    if args.flat:
        from smartglass_ocr_spark.corpus import spans_from_flat

        docs = spans_from_flat(docs)
    result = run_extraction_job(
        spark,
        docs,
        output_path=args.output,
        checkpoint_path=args.checkpoint,
        metrics_path=args.metrics,
        run_id=args.run_id,
        n_partitions=args.partitions,
    )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
