#!/bin/bash
# Canonical FFHQ shift-equivariance sweep (ref shift_ldm_ffhq.sh)
python scripts/shift_ldm_ffhq.py \
    --num_inference_steps 50 \
    --shift_steps 16 \
    --output_path results/shift_ldm.gif "$@"
