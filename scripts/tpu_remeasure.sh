#!/bin/bash
# Re-measure benchmark rows that predate the latest optimization round,
# plus any models never benchmarked.  Run from the repo root with the TPU
# up.  One TPU job at a time (see model_benchmark.py timing notes).
#
# Round-5 stale set: the four sub-1x rows (raft_small, lcv_raft_small,
# hd3, hd3_ctxt), the rows predating the r4 quadtree/scv/corr-pyramid
# optimizations (matchflow, matchflow_raft, scv4, scv8, separableflow,
# streamflow), and the two never-measured variants (ccmr_p, ms_raft_p).
set -e
CSV=outputs/benchmark_tpu/benchmark.csv
STALE="raft_small lcv_raft_small hd3 hd3_ctxt matchflow matchflow_raft \
scv4 scv8 separableflow streamflow"
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
    --models raft_small lcv_raft_small hd3 hd3_ctxt matchflow \
             matchflow_raft scv4 scv8 separableflow streamflow \
             ccmr_p ms_raft_p \
    --input_size 500 1000 --num_samples 10 --per_model_timeout 1800 \
    --output_path outputs/benchmark_tpu
python compare_benchmark.py --ours outputs/benchmark_tpu/benchmark.csv \
    --reference /root/reference/docs/source/results/model_benchmark-all.csv \
    --output_path docs/results/benchmark_vs_reference.md
python bench.py
