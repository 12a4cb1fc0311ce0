#!/usr/bin/env bash
# Build engine.zip for spark-submit --py-files (north_rule launch shape).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip biothings_crawler_spark -x '*__pycache__*'
echo "built engine.zip ($(du -h engine.zip | cut -f1))"
