#!/usr/bin/env bash
# Build dist/featurewiz_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/featurewiz_spark.zip
# zip the package at top level so `import featurewiz_spark` resolves
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/featurewiz_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("featurewiz_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/featurewiz_spark.zip")
EOF
