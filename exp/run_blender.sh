#!/usr/bin/env bash
# Run the full blender-synthetic suite sequentially (reference _exp/exp_blender_*.sh).
# Usage: exp/run_blender.sh [extra main.py flags...]
set -euo pipefail
cd "$(dirname "$0")/.."
for scene in chair drums ficus hotdog lego materials mic ship; do
    echo "=== blender/${scene} ==="
    python main.py --config "configs/blender/${scene}.txt" "$@"
done
