#!/usr/bin/env bash
# Full CI: fast tier, slow tier (golden TF parity, convergence, drivers),
# then the multichip dryrun. Bench is TPU-only and run separately.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== native extensions ==="
./tools/build_native.sh

echo "=== fast tier (default: pytest tests/) ==="
python -m pytest tests/ -q

echo "=== slow tier (golden parity, file restore, convergence) ==="
python -m pytest tests/ -q -m slow

echo "=== multichip dryrun (8 virtual devices) ==="
python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "=== full-size multichip SPMD compile (lite4@640, ~5 min) ==="
python -c "import __graft_entry__ as g; g.dryrun_multichip_full(8)"

echo "CI green."
