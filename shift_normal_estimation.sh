#!/bin/bash
# Normal-estimation shift sweep (ref shift_normal_estimation.sh)
python scripts/shift_normal_estimation.py --shift_steps 16 \
    --output_path results/shift_normal.gif "$@"
