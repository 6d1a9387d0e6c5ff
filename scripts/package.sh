#!/usr/bin/env bash
# Build the --py-files artifact: a pure-Python zip of dedupe_spark
# (no wheels needed — pandas/pyarrow/numpy ship with the cluster's
# PySpark runtime).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dedupe_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/dedupe_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("dedupe_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/dedupe_spark.zip")
EOF
unzip -l dist/dedupe_spark.zip | tail -3
