#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$ROOT/dist"
rm -f "$ROOT/dist/engine.zip"
cd "$ROOT"
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("cdr_analysis_tools_hadoop_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote dist/engine.zip")
EOF
