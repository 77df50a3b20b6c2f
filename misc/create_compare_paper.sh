#!/bin/bash
# Compare validation metrics against published paper numbers
# (reference parity: misc/create_compare_paper.sh).
python ../compare_paper_results.py \
    --summary_csv ../outputs/summary/summarized_metrics-epe.csv \
    --paper_csv ../docs/results/paper_results_things.csv \
    --add_delta
