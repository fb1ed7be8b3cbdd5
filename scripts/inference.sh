#!/usr/bin/env bash
# Single-video inference entry (reference: Vidi1.5_9B/scripts/inference.sh).
# The model path is a converted JAX checkpoint directory (infer/convert.py);
# pass --load-8bit to fit the 9B on one 16 GB chip.
python3 -u -m vidi_tpu.infer.pipeline \
    --video-path "Your Video Path" \
    --query "Your Query" \
    --model-path "Your Model Path"
