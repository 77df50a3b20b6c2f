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
    """Metric accumulator over batches.

    ``average_mode`` is ``"epoch_mean"`` (default) or ``"ema"`` with
    ``ema_decay`` and the reference's bias correction for the first
    ``min(100, 1/(1-decay))`` steps (flow_metrics.py:82,296-303).
    ``interpolate_pred_to_target_size`` bilinearly resizes predictions to the
    GT resolution (align_corners=True) and rescales flow vectors
    (flow_metrics.py:163-180).

    Usage: ``m.update(preds, targets)`` with the model's output/input dicts
    ((B, N, 2, H, W) contract), then ``m.compute()``.
    """

    def __init__(self, prefix: str = "", average_mode: str = "epoch_mean",
                 ema_decay: float = 0.99,
                 interpolate_pred_to_target_size: bool = False):
        assert average_mode in ("epoch_mean", "ema")
        self.prefix = prefix
        self.average_mode = average_mode
        self.ema_decay = ema_decay
        self.ema_max_count = min(100, int(1.0 / max(1.0 - ema_decay, 1e-8)))
        self.interpolate_pred_to_target_size = interpolate_pred_to_target_size
        self.reset()

    def reset(self):
        self._sums: Dict[str, float] = {}
        self._count = 0
        self._steps = 0

    @staticmethod
    def _interp_to(v, size, is_flow):
        from ..ops.grid_sample import interpolate

        h, w = int(v.shape[-2]), int(v.shape[-1])
        if (h, w) == tuple(size):
            return v
        lead = v.shape[:-3]
        x = jnp.moveaxis(v.reshape(-1, v.shape[-3], h, w), -3, -1)
        x = interpolate(x, tuple(size), mode="bilinear", align_corners=True)
        out = jnp.moveaxis(x, -1, -3).reshape(*lead, v.shape[-3], *size)
        if is_flow:
            out = out * jnp.asarray(
                [size[1] / w, size[0] / h], out.dtype).reshape(
                    (2,) + (1,) * 2)
        return out

    @staticmethod
    def _collapse(x):
        x = jnp.asarray(x)
        if x.ndim == 5:
            return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])
        return x

    def update(self, preds: Dict[str, Any], targets: Dict[str, Any]):
        tflows = jnp.asarray(targets["flows"])
        multi_hyp = tflows.ndim == 6
        if self.interpolate_pred_to_target_size:
            size = (int(tflows.shape[-2]), int(tflows.shape[-1]))
            preds = {
                k: (self._interp_to(jnp.asarray(v), size, "flow" in k)
                    if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 4
                    else v)
                for k, v in preds.items()
            }
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
        if self.average_mode == "epoch_mean":
            prev_w, next_w = 1.0, 1.0
        else:
            prev_w, next_w = self.ema_decay, 1.0 - self.ema_decay
        for k, v in vals.items():
            arr = np.asarray(v)
            self._sums[k] = (prev_w * self._sums.get(k, 0.0)
                             + next_w * float(arr.sum()))
        self._count += pf.shape[0]
        self._steps += 1

    def compute(self) -> Dict[str, float]:
        if self.average_mode == "epoch_mean":
            c = max(self._count, 1)
        else:
            c = 1.0
            if self._steps < self.ema_max_count:  # bias correction
                c -= self.ema_decay ** self._steps
            c = max(c, 1e-8)
        return {f"{self.prefix}{k}": v / c for k, v in self._sums.items()}
