#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/couch_to_mongo_spark.zip
zip -qr dist/couch_to_mongo_spark.zip couch_to_mongo_spark -x '*__pycache__*'
echo "dist/couch_to_mongo_spark.zip"
