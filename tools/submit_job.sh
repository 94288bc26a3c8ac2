#!/usr/bin/env bash
# North-rule ship path: spark-submit --py-files (BASELINE.json:14).
# Packages the library, submits the job through spark-submit exactly as a
# multi-executor cluster would receive it (swap --master for yarn/k8s).
#
# Usage: tools/submit_job.sh [--gen-turns N] [--output DIR] [--master local[N]] ...
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

PKG_ZIP="$(mktemp -d)/deepseek_ocr_vllm_spark.zip"
(cd "$REPO" && zip -qr "$PKG_ZIP" deepseek_ocr_vllm_spark -x '*__pycache__*')

# a thin runner that only imports from the shipped zip
RUNNER="$(mktemp -d)/run_extraction.py"
cat > "$RUNNER" <<'PY'
import sys
from deepseek_ocr_vllm_spark import job
job.main(sys.argv[1:])
PY

# run from a neutral cwd so the package can ONLY come from the shipped zip
cd "$(mktemp -d)"
exec spark-submit \
  --master "${SPARK_GRAFT_MASTER:-local[8]}" \
  --driver-memory "${SPARK_GRAFT_DRIVER_MEM:-8g}" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$PKG_ZIP" \
  "$RUNNER" "$@"
