#!/usr/bin/env bash
# ThreadSanitizer pass over the native runtime's concurrent paths (the
# reference has no race detection at all — SURVEY.md section 5).
#
#   tools/tsan_check.sh [input.bmp]
#
# Compiles ldpc_native.cc + tools/native_stress.cc with -fsanitize=thread
# and runs the SPSC-ring and pipeline-executor stress; any TSAN report or
# data-validation failure is fatal.
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=gr_ldpc_ece535a_tpu/runtime/native/ldpc_native.cc
STRESS=tools/native_stress.cc
OUT=$(mktemp -d)
BIN="$OUT/native_stress_tsan"
IMG="${1:-}"

if [ -z "$IMG" ]; then
  IMG="$OUT/test.bmp"
  python - "$IMG" <<'EOF'
import sys, numpy as np
sys.path.insert(0, ".")
from gr_ldpc_ece535a_tpu.utils.bmp import make_bmp
open(sys.argv[1], "wb").write(
    make_bmp(np.arange(48, dtype=np.uint8).reshape(4, 4, 3)))
EOF
fi

"${CXX:-g++}" -O1 -g -std=c++17 -fsanitize=thread -fPIE -pie \
  -o "$BIN" "$STRESS" "$SRC" -lpthread

TSAN_OPTIONS="halt_on_error=1" "$BIN" "$IMG" "$OUT/result.bmp"
cmp -s "$IMG" "$OUT/result.bmp" || { echo "output mismatch"; exit 1; }
echo "tsan_check: PASS (no data races reported)"
rm -rf "$OUT"
