#!/usr/bin/env bash
# Build the spark-submit artifact (north rule: spark-submit --py-files).
#
#   ./package.sh                      -> dist/destor_spark.zip
#   spark-submit --py-files dist/destor_spark.zip \
#       --conf spark.sql.shuffle.partitions=<2-3x total cores> \
#       dist/cli_main.py --input <web_pages path> --output <dir>
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p dist
rm -f dist/destor_spark.zip
zip -qr dist/destor_spark.zip destor_spark -x '*__pycache__*'
cp destor_spark/cli.py dist/cli_main.py
echo "built dist/destor_spark.zip ($(du -h dist/destor_spark.zip | cut -f1))"
