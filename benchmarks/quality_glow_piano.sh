#!/bin/bash
# Glow quality-parity run on the available piano data (VERDICT.md round-1
# item 3): train Glow at config scale (configs/melspec_glow.yml: L=3, K=40,
# 512 filters, learntop, adamax, batch 32, dB scale) and report test
# bits/px against the thesis's Table 3.4 best of 1.89.
#
# Data reality: only the 60 s piano stem exists here (reference: full
# recordings -> 4,863 train patches), so the number is data-limited; the
# val trajectory and final bits/px are recorded in docs/DESIGN.md either
# way. Reuses the train/test split built by quality_ncsn_piano.sh.
#
# Usage: bash benchmarks/quality_glow_piano.sh /path/to/workdir [n_epochs]
set -e
cd "$(dirname "$0")/.."
R=${1:-/tmp/quality_ncsn}
EPOCHS=${2:-400}

if [ ! -d "$R/ds/train" ]; then
    echo "run benchmarks/quality_ncsn_piano.sh $R first (builds the split)"
    exit 1
fi

python train_glow.py --dataset $R/ds --output $R/glow_piano_3_40_512_dB \
    --debug --L 3 --K 40 --n_filters 512 --learntop \
    --optimizer adamax --learning_rate 0.001 \
    --n_epochs $EPOCHS --batch_size 32

grep -E "Epoch|bits" $R/glow_piano_3_40_512_dB/out.log | tail -15
