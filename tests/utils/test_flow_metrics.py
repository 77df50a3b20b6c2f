"""Flow metric correctness vs straightforward numpy oracles."""

import numpy as np

import jax.numpy as jnp

from ptlflow_tpu.utils.flow_metrics import compute_flow_metrics, FlowMetrics


def _np_wauc(epe, valid):
    epe = epe.copy()
    epe[valid < 0.5] = 100
    epe = epe.reshape(epe.shape[0], -1)
    N = valid.reshape(valid.shape[0], -1).sum(axis=1)
    wauc = np.zeros(epe.shape[0])
    sum_wi = 0.0
    for i in range(1, 101):
        wi = 1 - (i - 1) / 100.0
        deltai = i / 20.0
        wauc += wi * (epe <= deltai).sum(axis=1)
        sum_wi += wi
    return 100 * wauc / (N * sum_wi + 1e-8)


def test_epe_px_flall_wauc_against_numpy():
    rng = np.random.RandomState(0)
    b, h, w = 3, 16, 20
    pred = rng.randn(b, 2, h, w).astype(np.float32) * 3
    gt = rng.randn(b, 2, h, w).astype(np.float32) * 3
    valid = (rng.rand(b, 1, h, w) > 0.2).astype(np.float32)

    out = compute_flow_metrics(jnp.asarray(pred), jnp.asarray(gt),
                               valids=jnp.asarray(valid))

    epe = np.linalg.norm(pred - gt, axis=1)
    tnorm = np.linalg.norm(gt, axis=1)
    v = valid[:, 0]
    vs = np.maximum(v.reshape(b, -1).sum(1), 1)

    def mm(x):
        return (x * v).reshape(b, -1).sum(1) / vs

    np.testing.assert_allclose(np.asarray(out["epe"]), mm(epe), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["px1"]), mm(epe < 1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["px3"]), mm(epe < 3), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["flall"]),
        mm(100.0 * ((epe > 3) & (epe > 0.05 * tnorm))), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["wauc"]), _np_wauc(epe, v),
                               rtol=1e-4)


def test_perfect_prediction():
    rng = np.random.RandomState(1)
    gt = rng.randn(2, 2, 8, 8).astype(np.float32)
    out = compute_flow_metrics(jnp.asarray(gt), jnp.asarray(gt))
    np.testing.assert_allclose(np.asarray(out["epe"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["px1"]), 1.0)
    np.testing.assert_allclose(np.asarray(out["flall"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["wauc"]), 100.0, rtol=1e-5)


def test_multi_hypothesis_gt_min_epe():
    rng = np.random.RandomState(2)
    pred = rng.randn(1, 2, 4, 4).astype(np.float32)
    gt_good = pred + 0.1
    gt_bad = pred + 10.0
    gt = np.stack([gt_bad, gt_good], axis=1)  # (B, K, 2, H, W)
    out = compute_flow_metrics(jnp.asarray(pred), jnp.asarray(gt))
    assert float(out["epe"][0]) < 0.2


def test_occlusion_splits():
    rng = np.random.RandomState(3)
    b, h, w = 1, 8, 8
    gt = rng.randn(b, 2, h, w).astype(np.float32)
    pred = gt.copy()
    occ = np.zeros((b, 1, h, w), np.float32)
    occ[:, :, :4] = 1.0
    pred[:, :, :4] += 5.0  # err only in occluded region
    out = compute_flow_metrics(jnp.asarray(pred), jnp.asarray(gt),
                               occs=jnp.asarray(occ))
    assert float(out["epe_non_occ"][0]) < 1e-5
    assert float(out["epe_occ"][0]) > 5.0


def test_accumulator_epoch_mean():
    rng = np.random.RandomState(4)
    m = FlowMetrics()
    gts, preds = [], []
    for i in range(3):
        gt = rng.randn(2, 1, 2, 8, 8).astype(np.float32)
        pred = gt + i  # epe = i * sqrt(2)
        gts.append(gt)
        preds.append(pred)
        m.update({"flows": pred}, {"flows": gt})
    out = m.compute()
    expected = np.mean([np.sqrt(2.0) * i for i in (0, 1, 2)])
    np.testing.assert_allclose(out["epe"], expected, rtol=1e-5)


def test_flow_metrics_ema_mode():
    """EMA averaging with bias correction (reference flow_metrics.py:82,
    154-160, 296-303): constant input -> exact value at every step."""
    from ptlflow_tpu.utils.flow_metrics import FlowMetrics

    rng = np.random.RandomState(0)
    pf = rng.randn(1, 1, 2, 8, 8).astype(np.float32)
    tf = rng.randn(1, 1, 2, 8, 8).astype(np.float32)
    epoch = FlowMetrics()
    ema = FlowMetrics(average_mode="ema", ema_decay=0.9)
    for _ in range(3):
        epoch.update({"flows": pf}, {"flows": tf})
        ema.update({"flows": pf}, {"flows": tf})
    want = epoch.compute()["epe"]
    got = ema.compute()["epe"]  # constant stream: bias-corrected EMA == mean
    assert abs(got - want) < 1e-5


def test_flow_metrics_interpolate_pred_to_target():
    """Half-resolution predictions are upscaled (and flow vectors rescaled)
    before comparison (reference flow_metrics.py:163-180)."""
    from ptlflow_tpu.utils.flow_metrics import FlowMetrics

    h, w = 16, 24
    tf = np.zeros((1, 1, 2, h, w), np.float32)
    tf[:, :, 0] = 4.0  # constant GT flow
    tf[:, :, 1] = 2.0
    pf_half = np.zeros((1, 1, 2, h // 2, w // 2), np.float32)
    pf_half[:, :, 0] = 2.0  # correct at half scale
    pf_half[:, :, 1] = 1.0
    m = FlowMetrics(interpolate_pred_to_target_size=True)
    m.update({"flows": pf_half}, {"flows": tf})
    assert m.compute()["epe"] < 1e-5
