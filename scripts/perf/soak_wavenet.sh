#!/bin/bash
# TPU soak test: train the flagship WaveNet through the REAL driver stack
# (CSV dataset -> loaders -> bucketed batches -> sharded bf16+accum train
# step -> tracker/JSONL -> best-metric checkpoints), then resume the run and
# train further — proving checkpoint/restore and the full framework loop on
# the chip, not just the bench microbenchmark.
#
# Dataset: any TIMIT-shaped CSV tree. Fabricate the canonical one (192
# synthetic harmonic clips of 16-24k samples) with:
#   BLVM_TPU_DATA_ROOT=/tmp/soak_data python scripts/perf/make_soak_data.py
#
# Usage: BLVM_TPU_DATA_ROOT=/tmp/soak_data ./scripts/perf/soak_wavenet.sh /tmp/soak_run
set -euo pipefail
RUN_DIR="${1:-/tmp/soak_run}"
EPOCHS_A="${EPOCHS_A:-30}"
EPOCHS_B="${EPOCHS_B:-15}"   # additional epochs after resume
# flagship by default; override for a tiny CPU smoke of the script itself
N_STACKS="${N_STACKS:-5}"; N_LAYERS="${N_LAYERS:-10}"; RES_CH="${RES_CH:-96}"
# batch_len follows the reference CLI: a float is SECONDS (x16000), so 8.0 =
# 128000 samples = the flagship B~8 x T=16000 budget. (Any numeric CLI value
# parses as float — "128000" would mean 128000 seconds and OOM.)
BATCH_LEN="${BATCH_LEN:-8.0}"; SEG="${SEG:-16000}"; TEST_EVERY="${TEST_EVERY:-5}"

common_args=(
  --dataset timit
  --batch_len "$BATCH_LEN"
  --n_stacks "$N_STACKS" --n_layers "$N_LAYERS" --res_channels "$RES_CH" --num_mix 10 --num_bits 16
  --random_segment_size "$SEG"
  --bf16 true --accum_steps 2
  --test_every "$TEST_EVERY"
  --seed 0 --num_workers 2
  --save_checkpoints true
)

echo "=== phase A: fresh run, $EPOCHS_A epochs"
python experiments/experiment_wavenet_audio.py "${common_args[@]}" --run_dir "$RUN_DIR" --epochs "$EPOCHS_A"

echo "=== phase B: resume from the run dir, $EPOCHS_B more epochs"
# --epochs is the ABSOLUTE target epoch (resume continues the numbering);
# resumed metrics land in a sibling dir, mirroring the covered test shape
python experiments/experiment_wavenet_audio.py "${common_args[@]}" --run_dir "$RUN_DIR-resumed" \
  --epochs "$((EPOCHS_A + EPOCHS_B))" --resume "$RUN_DIR"

echo "=== loss trajectory (train):"
python - "$RUN_DIR" "$RUN_DIR-resumed" <<'EOF'
import json, sys
rows = [json.loads(l) for d in sys.argv[1:] for l in open(d + "/metrics.jsonl")]
for r in rows:
    tr = r.get("timit_train", {})
    if "loss" in tr:
        print(f"epoch {r['epoch']:>3}: train loss {tr['loss']:.4f}")
EOF
