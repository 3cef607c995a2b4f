#!/bin/bash
# Trunk-zoo efficacy wave (VERDICT r3 item 4): 15-epoch synth runs for
# the exotic trunks under FasterRCNNFPN, sequentially (one TPU chip).
# Usage: bash tools/misc/run_trunk_wave.sh [logdir]
set -u
LOG=${1:-/tmp/trunk_wave}
mkdir -p "$LOG"
cd "$(dirname "$0")/../.."

run() {
  name=$1; cfg=$2
  echo "=== $name ==="
  timeout 3000 python -u tools/train.py "$cfg" \
    --work-dir "$LOG/$name" \
    > "$LOG/$name.log" 2>&1
  echo "$name exit=$?"
  grep -o 'AP50[^,}]*' "$LOG/$name.log" | tail -3
}

run hrnet_w18  configs/da/synth_trunk_smoke.py
run pvt_tiny   configs/da/synth_trunk_pvt.py
run res2net50  configs/da/synth_trunk_res2net50.py
run regnet     configs/da/synth_trunk_regnet.py
run resnest50  configs/da/synth_trunk_resnest50.py
echo ALL DONE
