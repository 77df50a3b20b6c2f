"""Flow metrics: EPE, px1/px3/px5, Fl-all, WAUC (+ occ/non-occ splits, F1).

Numerically matches the reference FlowMetrics
(/root/reference/ptlflow/utils/flow_metrics.py:31-481):
- per-sample masked means (invalid pixels excluded, clamp(valid_sum, 1));
- Fl-all = 100 * mean[(epe > 3) & (epe > 0.05*|gt|)];
- WAUC per the Spring spec (evaluation.py port at flow_metrics.py:456-481) —
  implemented here with a 101-bin histogram + cumsum instead of the 100x
  thresholding loop (identical result, O(P) instead of O(100 P));
- multi-hypothesis 5-D GT reduces to the min-EPE hypothesis
  (flow_metrics.py:199-203).

``compute_flow_metrics`` is a pure jittable function of NCHW tensors; the
``FlowMetrics`` class accumulates epoch means host-side and supports
cross-device reduction through ``jax.lax.psum`` when used inside pmapped/
sharded steps (sums + counts are linear).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _masked_mean(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-sample masked mean over all but the leading dim."""
    x = (x * valid).reshape(x.shape[0], -1)
    vs = jnp.clip(valid.reshape(valid.shape[0], -1).sum(axis=1), 1, None)
    return x.sum(axis=1) / vs


def _wauc(epe: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Spring WAUC per sample.  err_i = #(epe <= i/20), w_i = 1-(i-1)/100."""
    b = epe.shape[0]
    epe = jnp.where(valid > 0.5, epe, 100.0).reshape(b, -1)
    n = valid.reshape(b, -1).sum(axis=1)
    # bin index: smallest i with epe <= i/20 is ceil(epe*20); clamp to 101
    idx = jnp.clip(jnp.ceil(epe * 20.0).astype(jnp.int32), 0, 101)
    hist = jax.vmap(lambda v: jnp.bincount(v, length=102))(idx)
    cum = jnp.cumsum(hist, axis=1)  # cum[:, i] = #(epe <= i/20)
    i = jnp.arange(1, 101, dtype=epe.dtype)
    wi = 1.0 - (i - 1.0) / 100.0
    wauc = jnp.sum(wi[None] * cum[:, 1:101].astype(epe.dtype), axis=1)
    return 100.0 * wauc / (n * jnp.sum(wi) + 1e-8)


def _f1_score(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Macro F1 over the binary maps, per sample (f1_mode='macro')."""
    b = pred.shape[0]
    pred = (pred.reshape(b, -1) > 0.5)
    target = (target.reshape(b, -1) > 0.5)

    def f1(p, t):
        tp = jnp.sum(p & t, axis=1).astype(jnp.float32)
        fp = jnp.sum(p & ~t, axis=1).astype(jnp.float32)
        fn = jnp.sum(~p & t, axis=1).astype(jnp.float32)
        return 2 * tp / jnp.clip(2 * tp + fp + fn, 1e-8, None)

    return 0.5 * (f1(pred, target) + f1(~pred, ~target))


def compute_flow_metrics(
    pred_flows: jnp.ndarray, target_flows: jnp.ndarray,
    valids: Optional[jnp.ndarray] = None,
    occs: Optional[jnp.ndarray] = None,
    pred_occs: Optional[jnp.ndarray] = None,
    mbs: Optional[jnp.ndarray] = None, pred_mbs: Optional[jnp.ndarray] = None,
    pred_confs: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """All metrics, per sample.  Tensors are (B, 2, H, W) NCHW (or
    (B, K, 2, H, W) multi-hypothesis GT); masks (B, 1, H, W)."""
    pf = pred_flows.astype(jnp.float32)
    tf = target_flows.astype(jnp.float32)
    tf = jnp.nan_to_num(tf, nan=0.0) if valids is not None else tf

    if tf.ndim == 5:  # multi-hypothesis GT: pick min-EPE hypothesis
        epe_k = jnp.linalg.norm(pf[:, None] - tf, axis=2)  # (B, K, H, W)
        min_idx = jnp.argmin(epe_k, axis=1)
        epe = jnp.min(epe_k, axis=1)
        tnorm_k = jnp.linalg.norm(tf, axis=2)
        tnorm = jnp.take_along_axis(tnorm_k, min_idx[:, None], axis=1)[:, 0]
    else:
        epe = jnp.linalg.norm(pf - tf, axis=1)
        tnorm = jnp.linalg.norm(tf, axis=1)

    b = epe.shape[0]
    if valids is None:
        valid = jnp.ones_like(epe)
    else:
        valid = valids.astype(jnp.float32).reshape(b, *epe.shape[1:])

    out = {
        "epe": _masked_mean(epe, valid),
        "px1": _masked_mean((epe < 1).astype(jnp.float32), valid),
        "px3": _masked_mean((epe < 3).astype(jnp.float32), valid),
        "px5": _masked_mean((epe < 5).astype(jnp.float32), valid),
        "flall": _masked_mean(
            100.0 * ((epe > 3) & (epe > 0.05 * tnorm)).astype(jnp.float32),
            valid),
        "wauc": _wauc(epe, valid),
    }
    if occs is not None:
        occ = occs.astype(jnp.float32).reshape(b, *epe.shape[1:])
        valid_occ = occ * valid
        valid_non = (1 - occ) * valid
        for name, mask in (("occ", valid_occ), ("non_occ", valid_non)):
            out[f"epe_{name}"] = _masked_mean(epe, mask)
            out[f"px1_{name}"] = _masked_mean((epe < 1).astype(jnp.float32), mask)
            out[f"px3_{name}"] = _masked_mean((epe < 3).astype(jnp.float32), mask)
            out[f"px5_{name}"] = _masked_mean((epe < 5).astype(jnp.float32), mask)
            out[f"flall_{name}"] = _masked_mean(
                100.0 * ((epe > 3) & (epe > 0.05 * tnorm)).astype(jnp.float32),
                mask)
            out[f"wauc_{name}"] = _wauc(epe, mask)
        if pred_occs is not None:
            out["occ_f1"] = _f1_score(pred_occs.reshape(b, -1),
                                      occs.reshape(b, -1))
    if mbs is not None and pred_mbs is not None:
        out["mb_f1"] = _f1_score(pred_mbs.reshape(b, -1), mbs.reshape(b, -1))
    if pred_confs is not None:
        conf_target = jnp.exp(-jnp.sum((tf - pf) ** 2, axis=1))
        out["conf_f1"] = _f1_score(pred_confs.reshape(b, -1),
                                   conf_target.reshape(b, -1))
    return out


class FlowMetrics:
    """Epoch-mean accumulator over batches (reference average_mode default).

    Usage: ``m.update(preds, targets)`` with the model's output/input dicts
    ((B, N, 2, H, W) contract), then ``m.compute()``.
    """

    def __init__(self, prefix: str = ""):
        self.prefix = prefix
        self.reset()

    def reset(self):
        self._sums: Dict[str, float] = {}
        self._count = 0

    @staticmethod
    def _collapse(x):
        x = jnp.asarray(x)
        if x.ndim == 5:
            return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])
        return x

    def update(self, preds: Dict[str, Any], targets: Dict[str, Any]):
        tflows = jnp.asarray(targets["flows"])
        multi_hyp = tflows.ndim == 6
        pf = self._collapse(preds["flows"])
        tf = tflows.reshape(-1, *tflows.shape[2:]) if multi_hyp \
            else self._collapse(tflows)

        def opt(d, k):
            v = d.get(k)
            return self._collapse(v) if v is not None else None

        vals = compute_flow_metrics(
            pf, tf, valids=opt(targets, "valids"), occs=opt(targets, "occs"),
            pred_occs=opt(preds, "occs"), mbs=opt(targets, "mbs"),
            pred_mbs=opt(preds, "mbs"), pred_confs=opt(preds, "confs"))
        for k, v in vals.items():
            arr = np.asarray(v)
            self._sums[k] = self._sums.get(k, 0.0) + float(arr.sum())
        self._count += pf.shape[0]

    def compute(self) -> Dict[str, float]:
        c = max(self._count, 1)
        return {f"{self.prefix}{k}": v / c for k, v in self._sums.items()}
