"""spark-submit entry point for the upload/reindex analog.

    spark-submit --py-files engine.zip jobs/upload_job.py \
        --docs /data/raw_docs --pmid-info /data/pmid_info \
        --dest /data/typed_docs [--run-ts 2026-01-01]

Input docs table: (source string, doc_json string). Output: typed
(source, _id, doc_json) with canonical sorted-key JSON per the
registered per-source uploader (plans/upload.py).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--pmid-info")
    ap.add_argument("--dest", required=True)
    ap.add_argument("--run-ts", default="2026-01-01")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("biothings-upload-spark").getOrCreate()
    from biothings_crawler_spark.plans.upload import transform_docs

    docs = spark.read.parquet(args.docs)
    pmid_info = spark.read.parquet(args.pmid_info) if args.pmid_info else None
    out = transform_docs(docs, pmid_info, run_ts=args.run_ts)
    out.write.mode("overwrite").parquet(args.dest)
    print(json.dumps({"job": "upload", "rows": spark.read.parquet(args.dest).count()}))
    spark.stop()


if __name__ == "__main__":
    main()
