#!/bin/sh
# Build dist/ccspark.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ccspark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/ccspark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((root / "ccspark").glob("*.py")):
        z.write(p, p.as_posix())
print("dist/ccspark.zip written")
EOF
