#!/usr/bin/env bash
# Run the full LLFF real-scene suite sequentially (reference _exp/exp_llff_*.sh).
# Usage: exp/run_llff.sh [extra main.py flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
for scene in fern flower fortress horns leaves orchids room trex; do
    echo "=== llff/${scene} ==="
    python main.py --config "configs/llff/${scene}.txt" "$@"
done
