"""MaskFlowNet: deform-conv oracle parity, custom upsample parity, forward
smoke for both variants."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.maskflownet.maskflownet import (mfn_downsample,
                                                        mfn_upsample)
from ptlflow_tpu.ops.deform_conv import deform_conv2d


def _np_deform_conv(x, offset, weight, bias, padding=1):
    """Direct numpy oracle for stride-1 deformable conv with bilinear
    sampling and zero OOB (torchvision semantics)."""
    b, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    out = np.zeros((b, h, w, o), np.float32)

    def sample(img, yy, xx):
        val = np.zeros(img.shape[-1], np.float32)
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        for dy2, wy in ((0, 1 - (yy - y0)), (1, yy - y0)):
            for dx2, wx in ((0, 1 - (xx - x0)), (1, xx - x0)):
                yi, xi = y0 + dy2, x0 + dx2
                if 0 <= yi < h and 0 <= xi < w:
                    val += wy * wx * img[yi, xi]
        return val

    for bi in range(b):
        for yy in range(h):
            for xx in range(w):
                acc = np.zeros(o, np.float32)
                tap = 0
                for ky in range(kh):
                    for kx in range(kw):
                        dy = offset[bi, yy, xx, 2 * tap]
                        dx = offset[bi, yy, xx, 2 * tap + 1]
                        sy = yy + ky - padding + dy
                        sx = xx + kx - padding + dx
                        v = sample(x[bi], sy, sx)
                        acc += v @ weight[ky, kx]
                        tap += 1
                out[bi, yy, xx] = acc + bias
    return out


def test_deform_conv_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    b, h, w, c, o = 1, 5, 6, 4, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    offset = (rng.randn(b, h, w, 18) * 0.7).astype(np.float32)
    weight = rng.randn(3, 3, c, o).astype(np.float32) * 0.2
    bias = rng.randn(o).astype(np.float32)
    ref = _np_deform_conv(x, offset, weight, bias)
    out = deform_conv2d(jnp.asarray(x), jnp.asarray(offset),
                        jnp.asarray(weight), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def _torch_upsample(img, factor):
    """Reference Upsample oracle (maskflownet.py:80-107)."""
    B, C, H, W = img.shape
    c = (factor * 2 - 1) // 2
    k = 1 - torch.abs(c - torch.arange(factor * 2 - 1,
                                       dtype=img.dtype)) / (c + 1)
    kernel = (k.repeat(factor * 2 - 1).view(factor * 2 - 1, -1) *
              k.unsqueeze(1)).view(1, 1, factor * 2 - 1, factor * 2 - 1)
    batch_img = img.view(B * C, 1, H, W)
    batch_img = F.pad(batch_img, [0, 1, 0, 1], mode="replicate")
    up = F.conv_transpose2d(batch_img, kernel, stride=factor,
                            padding=factor - 1)
    up = up[:, :, :-1, :-1]
    return up.view(B, C, up.shape[-2], up.shape[-1])


def test_mfn_upsample_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 6, 8).astype(np.float32)
    for factor in (2, 4):
        ref = _torch_upsample(torch.from_numpy(x), factor)
        out = mfn_upsample(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                           factor)
        np.testing.assert_allclose(
            np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_maskflownet_s_forward():
    model = ptlflow_tpu.get_model("maskflownet_s")
    model.init_params()
    rng = np.random.RandomState(2)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert out["occs"].shape == (1, 1, 1, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()


def test_maskflownet_full_forward_and_loss():
    model = ptlflow_tpu.get_model("maskflownet")
    model.init_params()
    rng = np.random.RandomState(3)
    b, h, w = 1, 128, 128
    images = rng.rand(b, 2, 3, h, w).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (b, 1, 2, h, w)
    assert np.isfinite(np.asarray(out["flows"])).all()

    inputs = {
        "images": jnp.asarray(images),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    tr = model.forward(model.params, inputs, training=True)
    assert len(tr["flow_preds"]) == 5
    assert np.isfinite(float(model.loss_fn(tr, inputs)))
