#!/bin/bash
# Trunk-zoo efficacy wave (VERDICT r3 item 4): 15-epoch synth runs for
# the exotic trunks under FasterRCNNFPN, sequentially (one TPU chip).
# Usage: bash tools/misc/run_trunk_wave.sh [logdir]
set -u
LOG=${1:-/tmp/trunk_wave}
mkdir -p "$LOG"
cd "$(dirname "$0")/../.."

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 3000 python -u tools/train.py configs/da/synth_trunk_smoke.py \
    --work-dir "$LOG/$name" --cfg-options "$@" \
    > "$LOG/$name.log" 2>&1
  echo "$name exit=$?"
  grep -o 'AP50[^,}]*' "$LOG/$name.log" | tail -3
}

run hrnet_w18  model.backbone_cfg.type=HRNet model.backbone_cfg.base_width=18
run pvt_tiny   model.backbone_cfg.type=PVT
run res2net50  model.backbone_cfg.type=Res2Net model.backbone_cfg.depth=50
run regnet     model.backbone_cfg.type=RegNet
run resnest50  model.backbone_cfg.type=ResNeSt model.backbone_cfg.depth=50
echo ALL DONE
