#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/fess_ds_s3_spark.zip
mkdir -p dist
zip -qr dist/fess_ds_s3_spark.zip fess_ds_s3_spark
echo "dist/fess_ds_s3_spark.zip"
