#!/bin/bash
# Validate selected models on the standard four-benchmark suite
# (reference parity: misc/create_metrics.sh).
python ../validate.py \
    --val_dataset sintel-clean-trainval+sintel-final-trainval+kitti-2012-trainval+kitti-2015-trainval \
    --select ${@}
