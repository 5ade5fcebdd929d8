#!/bin/sh
# Build the --py-files artifact for spark-submit (north-rule launch form).
# Usage: tools/make_pyfiles_zip.sh [out.zip]   (default /tmp/sketchy_spark.zip)
set -e
OUT="${1:-/tmp/sketchy_spark.zip}"
cd "$(dirname "$0")/.."
rm -f "$OUT"
python - "$OUT" <<'EOF'
import sys, zipfile, pathlib
out = sys.argv[1]
root = pathlib.Path("sketchy_spark")
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.rglob("*.py")):
        z.write(p, p.as_posix())
print(f"wrote {out}")
EOF
