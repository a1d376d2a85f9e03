#!/bin/bash
# Image interpolation via flow-warped noise (ref image_interpolation.sh)
python scripts/image_interpolation.py --num_frames 17 \
    --num_inference_steps 50 --output_path results/interpolation.gif "$@"
