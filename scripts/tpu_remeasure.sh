#!/bin/bash
# Re-measure the models whose benchmark.csv rows predate the round-3
# optimizations (batched fnet, fused single-gather grid_sample, gather-free
# hd3 density2vector), plus the two models never benchmarked (ccmr_p,
# ms_raft_p via AltCorrBlock).  Run from the repo root with the TPU up.
# One TPU job at a time (see model_benchmark.py timing notes).
set -e
CSV=outputs/benchmark_tpu/benchmark.csv
STALE="raft_small lcv_raft_small hd3 hd3_ctxt"
python - "$CSV" $STALE <<'EOF'
import csv, sys
path, stale = sys.argv[1], set(sys.argv[2:])
with open(path, newline="") as f:
    rows = list(csv.DictReader(f))
keep = [r for r in rows if r["model"] not in stale]
dropped = len(rows) - len(keep)
with open(path, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0]))
    w.writeheader(); w.writerows(keep)
print(f"dropped {dropped} stale rows")
EOF
python model_benchmark.py \
    --models raft_small lcv_raft_small hd3 hd3_ctxt ccmr_p ms_raft_p \
    --input_size 500 1000 --num_samples 10 --per_model_timeout 1200 \
    --output_path outputs/benchmark_tpu
python compare_benchmark.py --ours outputs/benchmark_tpu/benchmark.csv \
    --reference /root/reference/docs/source/results/model_benchmark-all.csv \
    --output_path docs/results/benchmark_vs_reference.md
python bench.py
