"""jax.export deployment artifact: serialize -> reload -> same output
(TPU-native analog of rapidflow's ONNX export scripts)."""

import numpy as np

import ptlflow_tpu
from ptlflow_tpu.models.rapidflow.export import (export_model, load_exported,
                                                 save_exported)


def test_export_roundtrip(tmp_path):
    model = ptlflow_tpu.get_model("rapidflow_it1")
    model.init_params()
    exported = export_model(model, (64, 64))
    path = tmp_path / "rapidflow.stablehlo"
    save_exported(exported, str(path))
    assert path.stat().st_size > 1000

    fn = load_exported(str(path))
    rng = np.random.RandomState(0)
    images = rng.rand(1, 2, 3, 64, 64).astype(np.float32)
    got = np.asarray(fn(images))
    assert got.shape == (1, 2, 64, 64)

    out = model.forward(model.params, {"images": images}, training=False)
    flows = np.asarray(out["flows"])
    np.testing.assert_allclose(got, flows[:, -1], atol=1e-4)
