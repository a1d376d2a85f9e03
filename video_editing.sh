#!/bin/bash
# Video editing with AF-SD + CFA (ref video_editing.sh)
python scripts/video_editing.py --strength 0.7 --num_inference_steps 50 \
    --output_path results/video_edit.gif "$@"
