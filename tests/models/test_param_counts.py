"""Parameter-count parity vs the reference's own benchmark table
(/root/reference/docs/source/results/model_benchmark-all.csv).

An exact match (to the table's 1e-3 M precision) is a strong wholesale check
that every layer of every implemented model has the reference's shape.
"""

import csv

import pytest

import ptlflow_tpu
from ptlflow_tpu.nn import count_parameters, split_trainable

CSV_PATH = "/root/reference/docs/source/results/model_benchmark-all.csv"


def _reference_counts():
    with open(CSV_PATH) as f:
        return {row["Model"]: float(row["Params"])
                for row in csv.DictReader(f)}


REF_COUNTS = _reference_counts()
# The reference's CSV predates its own code for these: the current
# rapidflow update.py caps pred_stride at 8 (update.py:134), while the CSV
# numbers correspond to an uncapped min(pyramid_ranges) mask head
# (it1: +32^2*9-ch mask, it2: +16^2*9) — we follow the code.
CSV_STALE = {"rapidflow_it1", "rapidflow_it2"}
MODELS = [n for n in ptlflow_tpu.get_model_names()
          if n in REF_COUNTS and n not in CSV_STALE]


@pytest.mark.parametrize("name", MODELS)
def test_param_count_matches_reference(name):
    model = ptlflow_tpu.get_model(name)
    model.init_params()
    # the reference counts trainable nn.Parameters only — exclude BN
    # running stats and frozen backbones (requires_grad=False)
    trainable, _ = split_trainable(model.params,
                                   getattr(model, "frozen_prefixes", ()))
    params_m = count_parameters(trainable) / 1e6
    assert abs(params_m - REF_COUNTS[name]) < 1.5e-3, (
        f"{name}: ours {params_m:.6f}M vs reference "
        f"{REF_COUNTS[name]:.3f}M")
