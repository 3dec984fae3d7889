#!/bin/sh
# Package the engine for spark-submit --py-files
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/crawl4ai_spark.zip
python - <<'PY'
import zipfile, pathlib
with zipfile.ZipFile("dist/crawl4ai_spark.zip", "w") as z:
    for p in sorted(pathlib.Path("crawl4ai_spark").rglob("*.py")):
        z.write(p)
print("dist/crawl4ai_spark.zip built")
PY
