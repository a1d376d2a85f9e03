#!/bin/bash
# Canonical I2SB SR shift sweep (ref shift_ldm_sr.sh)
python scripts/shift_ldm_sr.py \
    --num_inference_steps 50 \
    --shift_steps 16 \
    --output_path results/shift_sr.gif "$@"
