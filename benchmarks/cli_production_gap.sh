#!/bin/bash
# Production-driver wall-clock on the benchmark workload (round-3 VERDICT
# weak #2: "the headline bench flatters the production path").
#
# Runs the REAL run_basis_sep.py CLI — trajectory collection, TensorBoard
# snapshots, results.npz postprocess, the works — on the reference's
# 1-minute mix with random-weight NCSNv1@192 priors (identical FLOPs to
# trained weights, so wall-clock is representative; bench.py does the
# same). The CLI's "Duration" line prices the per-level anneal including
# trajectory + host callbacks; pair with
# benchmarks/profile_trajectory_cost.py (same frame count, harness-only)
# to split the delta into trajectory cost vs driver overhead.
#
# Usage: bash benchmarks/cli_production_gap.sh [workdir]
set -e
cd "$(dirname "$0")/.."
R=${1:-/tmp/cli_gap}
SONG=/root/reference/basis_sep_results/beethoven_sonata_1_sep_1min
N_MIXED=28

mkdir -p $R/song
cp -n $SONG/mix.wav $R/song/mix.wav
cp -n $SONG/gt1.wav $R/song/piano.wav
cp -n $SONG/gt2.wav $R/song/violin.wav

# random-weight checkpoints in the layout the CLI restores from
if [ ! -f "$R/prior1/ckpts/checkpoint.json" ]; then
python - "$R" <<'EOF'
import sys
import jax, jax.numpy as jnp
from audiosourcesep_tpu.models.ncsn import get_score_model
from audiosourcesep_tpu.training import CheckpointManager
r = sys.argv[1]
model = get_score_model("v1", (96, 64, 1), 192, 10)
for i, seed in enumerate((0, 1)):
    params = model.init_params(jax.random.PRNGKey(seed))
    CheckpointManager(f"{r}/prior{i+1}/ckpts").save({"params": params}, 0)
    print(f"saved prior{i+1}")
EOF
fi

t0=$(date +%s)
python run_basis_sep.py $R/prior1 $R/prior2 \
    --output $R/sep --debug --dataset melspec --song_dir $R/song \
    --n_mixed $N_MIXED --T 100 --num_classes 10 \
    --sigma1 1.0 --sigmaL 0.01 --progression logarithmic \
    --n_filters 192 --version v1 --compute_dtype bf16 \
    2>&1 | tee $R/cli.log | grep -E "Data Loaded|Duration|Sigma.*done" || true
t1=$(date +%s)
echo "total_cli_wallclock_s: $((t1 - t0))"
grep -E "Duration" $R/cli.log
