#!/bin/bash
# Speed/accuracy scatter plots (reference parity: misc/create_plots.sh).
python ../plot_results.py \
    --metrics_csv ../outputs/summary/summarized_metrics-epe.csv \
    --benchmark_csv ../outputs/benchmark/benchmark.csv \
    --checkpoint_names things \
    --metric_dataset sintel-final-trainval

python ../plot_results.py \
    --metrics_csv ../outputs/summary/summarized_metrics-flall.csv \
    --benchmark_csv ../outputs/benchmark/benchmark.csv \
    --checkpoint_names things \
    --metric_dataset kitti-2015-trainval
