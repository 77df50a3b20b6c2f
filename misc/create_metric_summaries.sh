#!/bin/bash
# Pivot validate CSVs into per-metric summary tables
# (reference parity: misc/create_metric_summaries.sh).
python ../summary_metrics.py --metrics_path ../outputs/validate --metrics epe
python ../summary_metrics.py --metrics_path ../outputs/validate --metrics epe flall
