#!/usr/bin/env bash
# Convergence smoke for the whole model zoo on the real chip (synthetic data).
set -uo pipefail
cd "$(dirname "$0")/.."
for model in mm_fibinet xdeepfm finalmlp sasrec_fibinet dcnv2 deepfm autoint din masknet pnn dlrm; do
  echo "=== $model ==="
  timeout 1500 python -m ctr_recommendation_tpu.cli.train \
    --synthetic /tmp/tpu_synth --epochs 3 --batch-size 4096 \
    --model "$model" --checkpoint-dir "/tmp/tpu_ckpt_$model" 2>&1 | grep -E "epoch|Done"
done
