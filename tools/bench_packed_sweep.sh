#!/bin/bash
# Round-5 packed-backbone-entry TPU sweep (VERDICT r4 items 3 and 5).
#
# Measures the lane-packed entry stages (models/efficientnet_packed.py) on
# the real chip against the recorded unpacked numbers (docs/ZOO_BENCH.json):
#   - giants' b8 serve (d5-d7x, the 68-72%-of-roofline rows)
#   - lite4 attack-train step (bench.py --packed-entry)
# Packed depth per model = through the first stride-2 block that crosses
# C>=128 (the natural packed->unpacked exit, see PackedMBConvBlock).
# Writes docs/ZOO_BENCH_packed.json; does NOT touch the unpacked sweep file.
set -x
cd "$(dirname "$0")/.."
OUT=docs/ZOO_BENCH_packed.json
timeout 1500 python tools/bench_zoo.py --models d7x --batches 8 --iters 20 \
    --packed-entry 19 --out "$OUT"
timeout 1500 python tools/bench_zoo.py --models d7 --batches 8 --iters 20 \
    --packed-entry 16 --out "$OUT"
timeout 1500 python tools/bench_zoo.py --models d6 --batches 8 --iters 20 \
    --packed-entry 16 --out "$OUT"
timeout 1500 python tools/bench_zoo.py --models d5 --batches 8 --iters 20 \
    --packed-entry 14 --out "$OUT"
