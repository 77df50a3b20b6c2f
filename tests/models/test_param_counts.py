"""Parameter-count parity vs the reference's own benchmark table
(/root/reference/docs/source/results/model_benchmark-all.csv).

An exact match (to the table's 1e-3 M precision) is a strong wholesale check
that every layer of every implemented model has the reference's shape.
"""

import csv

import pytest

import ptlflow_tpu
from ptlflow_tpu.nn import count_parameters

CSV_PATH = "/root/reference/docs/source/results/model_benchmark-all.csv"


def _reference_counts():
    with open(CSV_PATH) as f:
        return {row["Model"]: float(row["Params"])
                for row in csv.DictReader(f)}


REF_COUNTS = _reference_counts()
MODELS = [n for n in ptlflow_tpu.get_model_names() if n in REF_COUNTS]


@pytest.mark.parametrize("name", MODELS)
def test_param_count_matches_reference(name):
    model = ptlflow_tpu.get_model(name)
    model.init_params()
    params_m = count_parameters(model.params) / 1e6
    assert abs(params_m - REF_COUNTS[name]) < 1.5e-3, (
        f"{name}: ours {params_m:.6f}M vs reference "
        f"{REF_COUNTS[name]:.3f}M")
