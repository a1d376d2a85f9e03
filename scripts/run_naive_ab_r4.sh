#!/bin/bash
# Round-4 flagship A/B completion (VERDICT r3 item 1): retrain the naive arm
# from scratch on a genuinely naive VAE (the r3 one silently trained with
# alias-free wiring ON — config-precedence bug, fixed in models/vae.py),
# step-matched to the AF arm (2020 VAE / 4500 LDM steps, same data/seeds),
# then eval both arms and write the report. Serialized: ONE TPU job at a
# time on the relay (CLAUDE.md).
set -euo pipefail
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

# the r3 naive arm is invalid (AF-wired VAE) — every derived artifact goes
rm -rf results/flagship_ab/naive results/flagship_ab/report.json

$PY scripts/flagship_ab.py vae  --arm naive --max_steps 2020
$PY scripts/flagship_ab.py ldm  --arm naive --max_steps 4500
$PY scripts/flagship_ab.py eval --arm naive
# re-run the AF eval so both eval.json carry the new audit fields
# (vae/unet flags + train step counts) under the fixed loader
$PY scripts/flagship_ab.py eval --arm af
$PY scripts/flagship_ab.py report
echo "A/B COMPLETE"
cat results/flagship_ab/report.json
