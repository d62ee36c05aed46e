#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f dist/cernan_spark.zip
mkdir -p dist
zip -qr dist/cernan_spark.zip cernan_spark -x '*__pycache__*'
echo "dist/cernan_spark.zip"
