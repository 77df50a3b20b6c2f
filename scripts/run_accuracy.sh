#!/bin/bash
# One-command accuracy evidence pipeline (VERDICT r3 Next #6).
#
# On the first machine with network access (or a pre-populated weights
# volume), this produces the TPU counterpart of the reference's published
# accuracy artifacts:
#   - docs/results/summarized_metrics-epe.csv   (+ one CSV per metric)
#     [reference: /root/reference/docs/source/results/summarized_metrics-epe.csv]
#   - outputs/validate/<model>_<ckpt>/metrics.csv  (per-sample rows)
#   - the 381-value golden EPE gate
#     [reference: tests/ptlflow/models/test_checkpoints.py:419-478]
#   - a bf16 re-validation report for the PROVISIONAL allow-list entries
#
# Weights volume layout (offline use): place the reference release .ckpt
# files in the torch-hub cache, keeping their release filenames —
#     ${TORCH_HOME:-~/.cache/torch}/hub/checkpoints/<name>-<sha8>.ckpt
# e.g. raft-things-802bbcfd.ckpt.  ptlflow_tpu.load_checkpoint() resolves
# named checkpoints there before attempting any download, so a populated
# cache makes the whole pipeline network-free.  Dataset paths come from
# datasets.yaml (sintel + kitti 2012/2015 are required below).
#
# Usage:  bash scripts/run_accuracy.sh [--quick]
#   --quick: raft-family only (a smoke run; the full sweep takes hours)
set -e
cd "$(dirname "$0")/.."

VAL_DATASETS="sintel-clean+sintel-final+kitti-2012+kitti-2015"
SELECT_ARGS=()
if [ "$1" = "--quick" ]; then
    SELECT_ARGS=(--select raft raft_small sea_raft gma)
fi

echo "=== 1/4: golden-table checkpoint gate (381 per-sample EPE values) ==="
PTLFLOW_TPU_CKPT_GATE=1 python -m pytest \
    tests/models/test_checkpoints_gate.py -q --no-header

echo "=== 2/4: full validation sweep -> per-model metrics.csv ==="
python validate.py --all "${SELECT_ARGS[@]}" \
    --val_dataset "$VAL_DATASETS" \
    --output_path outputs/validate

echo "=== 3/4: pivot into reference-format summary tables ==="
python summary_metrics.py --metrics_path outputs/validate \
    --output_path docs/results
# reference artifact name parity
if [ -f docs/results/summarized_metrics_epe.csv ] && \
   [ ! -f docs/results/summarized_metrics-epe.csv ]; then
    cp docs/results/summarized_metrics_epe.csv \
       docs/results/summarized_metrics-epe.csv
fi

echo "=== 4/4: re-validate PROVISIONAL bf16 entries with real weights ==="
PROV=$(python -c "import json; print(' '.join(json.load(open(
    'ptlflow_tpu/utils/bf16_allowlist.json'))['provisional']))")
if [ -n "$PROV" ]; then
    python validate.py --select $PROV --bf16 \
        --val_dataset sintel-clean \
        --output_path outputs/validate_bf16
    echo "Compare outputs/validate_bf16 EPEs against outputs/validate;"
    echo "promote entries whose bf16 EPE delta < 0.05 into 'allow' in"
    echo "ptlflow_tpu/utils/bf16_allowlist.json."
fi

echo "accuracy pipeline complete: see docs/results/summarized_metrics-epe.csv"
