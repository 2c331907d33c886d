#!/usr/bin/env bash
# Package the engine and launch the extraction job via spark-submit
# --py-files (the north_rule launch mode).  Usage:
#   tools/submit.sh --input fixtures/tiny/pages.parquet --output /tmp/out
set -euo pipefail
cd "$(dirname "$0")/.."

mkdir -p dist
rm -f dist/ocr_spark.zip
# zip the package only (no fixtures, no caches)
(cd . && find ocr_spark -name '*.py' | zip -q dist/ocr_spark.zip -@)

MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${OCR_SPARK_DRIVER_MEM:-16g}" \
  --py-files dist/ocr_spark.zip \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=512 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.files.maxPartitionBytes="${OCR_SPARK_MAX_PARTITION_BYTES:-4194304}" \
  jobs/extract_job.py "$@"
