#!/usr/bin/env bash
# Full MicroLens-scale workload on the real chip: ~4.1M synthetic rows,
# 91718-item vocab, the reference's exact recipe (bs 4096, Adam + OneCycle,
# clip 10, E=128) — the reference's logged run was 800-999 steps/epoch at
# this batch size (SURVEY §6); this reproduces that scale end to end.
set -uo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-5}"
timeout 3000 python -m ctr_recommendation_tpu.cli.train \
  --synthetic /tmp/tpu_fullscale --synthetic-rows 4100000 --synthetic-items 91717 \
  --epochs "$EPOCHS" --batch-size 4096 \
  --checkpoint-dir /tmp/tpu_fullscale_ckpt "${@:2}"
