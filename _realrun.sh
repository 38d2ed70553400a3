#!/bin/bash
# Full product loop on the reference's real 1-min Beethoven mix, on TPU.
set -e
cd /root/repo
R=/tmp/realrun
log() { echo "[$(date +%H:%M:%S)] $*"; }

log "wav_to_spec piano"
python wav_to_spec.py $R/piano_src $R/piano_ds/train --use_dB --tfrecords
cp -r $R/piano_ds/train $R/piano_ds/test
log "wav_to_spec violin"
python wav_to_spec.py $R/violin_src $R/violin_ds/train --use_dB --tfrecords
cp -r $R/violin_ds/train $R/violin_ds/test

log "train piano NCSN"
python train_ncsn.py --dataset $R/piano_ds --output $R/ncsn_piano --debug \
    --version v1 --n_filters 192 --num_classes 10 --sigma1 1.0 --sigmaL 0.01 \
    --progression logarithmic --n_epochs 300 --batch_size 8 --T 1 \
    --learning_rate 0.001 2>&1 | tail -3
log "train violin NCSN"
python train_ncsn.py --dataset $R/violin_ds --output $R/ncsn_violin --debug \
    --version v1 --n_filters 192 --num_classes 10 --sigma1 1.0 --sigmaL 0.01 \
    --progression logarithmic --n_epochs 300 --batch_size 8 --T 1 \
    --learning_rate 0.001 2>&1 | tail -3

log "BASIS separation (T=100, 10 levels, 28 frames)"
python run_basis_sep.py $R/ncsn_piano $R/ncsn_violin --output $R/basis \
    --debug --dataset melspec --song_dir $R/song --model_type ncsn \
    --version v1 --n_mixed 28 --T 100 --sigma1 1.0 --sigmaL 0.01 \
    --num_classes 10 --progression logarithmic --n_filters 192 2>&1 | tail -4

log "inversion (phase reuse + wiener)"
python melspec_inversion_basis.py $R/basis --debug --algorithm reuse_phase \
    --method frame --wiener_filter 2>&1 | tail -2

log "BSS-Eval"
python - <<'EOF'
import numpy as np, json
from audiosourcesep_tpu.evaluation import bss_eval
from audiosourcesep_tpu.data import read_wav
inv = "/tmp/realrun/basis/inverse_reuse_phase_frame_wiener_filter"
est1, _ = read_wav(f"{inv}/sep1.wav"); est2, _ = read_wav(f"{inv}/sep2.wav")
gt1, _ = read_wav(f"{inv}/gt1.wav"); gt2, _ = read_wav(f"{inv}/gt2.wav")
n = min(map(len, (est1, est2, gt1, gt2)))
refs = np.stack([gt1[:n], gt2[:n]])[:, :, None]
ests = np.stack([est1[:n], est2[:n]])[:, :, None]
sdr, isr, sir, sar, _ = bss_eval(refs, ests, window=np.inf, hop=np.inf,
                                 compute_permutation=True)
print(json.dumps({
    "sdr": [round(float(np.nanmean(sdr[i])), 2) for i in range(2)],
    "sir": [round(float(np.nanmean(sir[i])), 2) for i in range(2)],
    "sar": [round(float(np.nanmean(sar[i])), 2) for i in range(2)],
}))
# oracle upper bound for context
from audiosourcesep_tpu.evaluation import IBM
mix, _ = read_wav("/tmp/realrun/song/mix.wav")
oracle = IBM(mix[:n, None], refs)
sdr_o, _, sir_o, sar_o, _ = bss_eval(refs, oracle, window=np.inf,
                                     hop=np.inf)
print(json.dumps({"oracle_IBM_sdr":
                  [round(float(np.nanmean(sdr_o[i])), 2) for i in range(2)]}))
EOF
log "done"
