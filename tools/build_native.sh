#!/usr/bin/env bash
# Build the native C extensions into the package tree.
# data/tfrecord.py auto-loads _tfrecord_native when present (pure-python
# fallback otherwise), so this is optional but recommended for ingest-heavy
# training runs.
set -euo pipefail
cd "$(dirname "$0")/.."

PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
OUT="mladversarialobjectdetection_tpu/data/_tfrecord_native${EXT}"

cc -O3 -fPIC -shared -I"${PYINC}" native/tfrecord_native.c -o "${OUT}"
echo "built ${OUT}"
python - <<'EOF'
from mladversarialobjectdetection_tpu.data import _tfrecord_native as m
import struct
assert m.crc32c(b"123456789") == 0xE3069283  # CRC32C check value
print("crc32c self-test ok")
EOF
