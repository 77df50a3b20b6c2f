"""GANet scan ops vs literal numpy transcriptions of the CUDA kernels
(/root/reference/ptlflow/models/separableflow/libs/GANet/src/GANet_kernel.cu
sga_*_forward, NLF_kernel.cu nlf_*_forward)."""

import numpy as np

import jax.numpy as jnp

from ptlflow_tpu.models.separableflow.ganet import (nlf_down, nlf_iter,
                                                    nlf_left, nlf_right,
                                                    nlf_up, sga)


# ------------------------------------------------------------- numpy oracles
def np_sga_down(x, f):
    # x: (B, C, D, H, W); f: (B, 5, H, W)
    b, c, d_, h, w = x.shape
    out = x.copy()
    for bb in range(b):
        for cc in range(c):
            for col in range(w):
                kp = 0
                for row in range(h):
                    k = kp
                    kp = 0
                    for d in range(d_):
                        t = out[bb, cc, d, row, col] * f[bb, 0, row, col]
                        def prev(dd):
                            return out[bb, cc, dd, row - 1, col]
                        cur = x[bb, cc, d, row, col]
                        t += (prev(d) if row > 0 else cur) * f[bb, 1, row, col]
                        t += (prev(d - 1) if row > 0 and d > 0 else cur) * \
                            f[bb, 2, row, col]
                        t += (prev(d + 1) if row > 0 and d + 1 < d_ else
                              cur) * f[bb, 3, row, col]
                        t += (prev(k) if row > 0 else cur) * f[bb, 4, row, col]
                        out[bb, cc, d, row, col] = t
                        if out[bb, cc, kp, row, col] < t:
                            kp = d
    return out


def np_sga_up(x, f):
    b, c, d_, h, w = x.shape
    out = x.copy()
    for bb in range(b):
        for cc in range(c):
            for col in range(w):
                kp = 0
                for row in range(h - 1, -1, -1):
                    k = kp
                    kp = 0
                    for d in range(d_):
                        t = out[bb, cc, d, row, col] * f[bb, 0, row, col]
                        def prev(dd):
                            return out[bb, cc, dd, row + 1, col]
                        cur = x[bb, cc, d, row, col]
                        t += (prev(d) if row + 1 < h else cur) * \
                            f[bb, 1, row, col]
                        t += (prev(d - 1) if row + 1 < h and d > 0 else cur) \
                            * f[bb, 2, row, col]
                        t += (prev(d + 1) if row + 1 < h and d + 1 < d_ else
                              cur) * f[bb, 3, row, col]
                        t += (prev(k) if row + 1 < h else cur) * \
                            f[bb, 4, row, col]
                        out[bb, cc, d, row, col] = t
                        if out[bb, cc, kp, row, col] < t:
                            kp = d
    return out


def np_nlf_down(x, f):
    # x: (B, C, H, W); f: (B, 5, H, W); NLF_kernel.cu:22-78
    b, c, h, w = x.shape
    out = x.copy()
    for bb in range(b):
        for cc in range(c):
            for row in range(h):
                for col in range(w):
                    cur = out[bb, cc, row, col]
                    t = cur * f[bb, 0, row, col]
                    t += (out[bb, cc, row - 1, col] if row > 0 else cur) * \
                        f[bb, 1, row, col]
                    t += (out[bb, cc, row - 1, col - 1]
                          if row > 0 and col > 0 else cur) * \
                        f[bb, 2, row, col]
                    t += (out[bb, cc, row - 1, col + 1]
                          if row > 0 and col + 1 < w else cur) * \
                        f[bb, 3, row, col]
                    t += (out[bb, cc, row, col - 1] if col > 0 else cur) * \
                        f[bb, 4, row, col]
                    out[bb, cc, row, col] = t
    return out


def np_nlf_up(x, f):
    b, c, h, w = x.shape
    out = x.copy()
    for bb in range(b):
        for cc in range(c):
            for row in range(h - 1, -1, -1):
                for col in range(w - 1, -1, -1):
                    cur = out[bb, cc, row, col]
                    t = cur * f[bb, 0, row, col]
                    t += (out[bb, cc, row + 1, col] if row + 1 < h else cur) \
                        * f[bb, 1, row, col]
                    t += (out[bb, cc, row + 1, col - 1]
                          if row + 1 < h and col > 0 else cur) * \
                        f[bb, 2, row, col]
                    t += (out[bb, cc, row + 1, col + 1]
                          if row + 1 < h and col + 1 < w else cur) * \
                        f[bb, 3, row, col]
                    t += (out[bb, cc, row, col + 1] if col + 1 < w else cur) \
                        * f[bb, 4, row, col]
                    out[bb, cc, row, col] = t
    return out


def np_nlf_right(x, f):
    b, c, h, w = x.shape
    out = x.copy()
    for bb in range(b):
        for cc in range(c):
            for col in range(w):
                for row in range(h):
                    cur = out[bb, cc, row, col]
                    t = cur * f[bb, 0, row, col]
                    t += (out[bb, cc, row, col - 1] if col > 0 else cur) * \
                        f[bb, 1, row, col]
                    t += (out[bb, cc, row - 1, col - 1]
                          if col > 0 and row > 0 else cur) * \
                        f[bb, 2, row, col]
                    t += (out[bb, cc, row + 1, col - 1]
                          if col > 0 and row + 1 < h else cur) * \
                        f[bb, 3, row, col]
                    t += (out[bb, cc, row - 1, col] if row > 0 else cur) * \
                        f[bb, 4, row, col]
                    out[bb, cc, row, col] = t
    return out


def np_nlf_left(x, f):
    b, c, h, w = x.shape
    out = x.copy()
    for bb in range(b):
        for cc in range(c):
            for col in range(w - 1, -1, -1):
                for row in range(h - 1, -1, -1):
                    cur = out[bb, cc, row, col]
                    t = cur * f[bb, 0, row, col]
                    t += (out[bb, cc, row, col + 1] if col + 1 < w else cur) \
                        * f[bb, 1, row, col]
                    t += (out[bb, cc, row - 1, col + 1]
                          if col + 1 < w and row > 0 else cur) * \
                        f[bb, 2, row, col]
                    t += (out[bb, cc, row + 1, col + 1]
                          if col + 1 < w and row + 1 < h else cur) * \
                        f[bb, 3, row, col]
                    t += (out[bb, cc, row + 1, col] if row + 1 < h else cur) \
                        * f[bb, 4, row, col]
                    out[bb, cc, row, col] = t
    return out


def _rand_guidance(rng, b, h, w):
    g = rng.rand(b, 5, h, w).astype(np.float32) + 0.1
    return g / g.sum(1, keepdims=True)


def test_nlf_directions_parity():
    rng = np.random.RandomState(0)
    b, c, h, w = 1, 3, 6, 7
    x = rng.randn(b, c, h, w).astype(np.float32)
    for jfn, nfn in ((nlf_down, np_nlf_down), (nlf_up, np_nlf_up),
                     (nlf_right, np_nlf_right), (nlf_left, np_nlf_left)):
        g = _rand_guidance(rng, b, h, w)
        got = np.asarray(jfn(jnp.asarray(x), jnp.asarray(g)))
        want = nfn(x, g)
        np.testing.assert_allclose(got, want, atol=1e-4,
                                   err_msg=jfn.__name__)


def test_nlf_iter_chain():
    rng = np.random.RandomState(1)
    b, c, h, w = 1, 2, 5, 6
    x = rng.randn(b, c, h, w).astype(np.float32)
    gs = [_rand_guidance(rng, b, h, w) for _ in range(4)]
    got = np.asarray(nlf_iter(jnp.asarray(x), *map(jnp.asarray, gs)))
    want = np_nlf_left(np_nlf_right(np_nlf_up(np_nlf_down(x, gs[0]), gs[1]),
                                    gs[2]), gs[3])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sga_parity():
    rng = np.random.RandomState(2)
    b, c, d, h, w = 1, 2, 5, 6, 7
    x = rng.randn(b, c, d, h, w).astype(np.float32)
    gs = [_rand_guidance(rng, b, h, w) for _ in range(4)]
    got = np.asarray(sga(jnp.asarray(x), *map(jnp.asarray, gs)))

    down = np_sga_down(x, gs[0])
    up = np_sga_up(x, gs[1])
    # right/left via the H<->W transpose of down/up (matching the kernels)
    xt = x.transpose(0, 1, 2, 4, 3)
    gt = [g.transpose(0, 1, 3, 2) for g in gs]
    right = np_sga_down(xt, gt[2]).transpose(0, 1, 2, 4, 3)
    left = np_sga_up(xt, gt[3]).transpose(0, 1, 2, 4, 3)
    want = np.maximum(np.maximum(down, up), np.maximum(right, left))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ganet_ops_differentiable():
    """Training-grade gradients flow through the directional scans
    (SURVEY hard-part #6: the reference needs custom CUDA backward kernels;
    lax.scan/associative_scan differentiate natively)."""
    import jax

    rng = np.random.RandomState(0)
    cost = jnp.asarray(rng.randn(1, 3, 8, 6, 6).astype(np.float32))
    gs = [jnp.asarray(rng.rand(1, 5, 6, 6).astype(np.float32))
          for _ in range(4)]
    gs = [g / g.sum(1, keepdims=True) for g in gs]

    grads = jax.grad(lambda c, g0, g1, g2, g3:
                     jnp.sum(sga(c, g0, g1, g2, g3) ** 2),
                     argnums=(0, 1, 2, 3, 4))(cost, *gs)
    assert all(bool(jnp.isfinite(x).all()) for x in grads)
    assert float(jnp.abs(grads[0]).sum()) > 0

    x2 = jnp.asarray(rng.randn(1, 3, 6, 6).astype(np.float32))
    grads2 = jax.grad(lambda x, g0, g1, g2, g3:
                      jnp.sum(nlf_iter(x, g0, g1, g2, g3) ** 2),
                      argnums=(0, 1))(x2, *gs)
    assert all(bool(jnp.isfinite(x).all()) for x in grads2)


# -------------------------------------------- torch-autograd gradient oracle
def _torch_sga_down(x, f):
    """Vectorized torch transcription of sga_down_forward (GANet_kernel.cu:
    66-127), rows sequential, autograd-friendly (no in-place writes).
    x: (B, C, D, H, W); f: (B, 5, H, W)."""
    import torch

    h = x.shape[3]
    rows = []
    prev = None
    for row in range(h):
        xr = x[:, :, :, row]                      # (B, C, D, W)
        fr = [f[:, i, None, None, row] for i in range(5)]  # (B,1,1,W) each
        if prev is None:
            out_r = xr * (fr[0] + fr[1] + fr[2] + fr[3] + fr[4])
        else:
            pdm = torch.cat([xr[:, :, :1], prev[:, :, :-1]], dim=2)
            pdp = torch.cat([prev[:, :, 1:], xr[:, :, -1:]], dim=2)
            k = prev.argmax(dim=2, keepdim=True)
            pk = prev.gather(2, k)
            out_r = (xr * fr[0] + prev * fr[1] + pdm * fr[2]
                     + pdp * fr[3] + pk * fr[4])
        rows.append(out_r)
        prev = out_r
    return torch.stack(rows, dim=3)


def _torch_sga(x, gs):
    import torch

    down = _torch_sga_down(x, gs[0])
    up = _torch_sga_down(x.flip(3), gs[1].flip(2)).flip(3)
    xt = x.transpose(3, 4)
    gt = [g.transpose(2, 3) for g in gs]
    right = _torch_sga_down(xt, gt[2]).transpose(3, 4)
    left = _torch_sga_down(xt.flip(3), gt[3].flip(2)).flip(3).transpose(3, 4)
    return torch.maximum(torch.maximum(down, up), torch.maximum(right, left))


def test_sga_gradient_oracle():
    """jax.grad through the sga scans == torch.autograd through a literal
    transcription — the training-grade check for SURVEY hard-part #6 (the
    reference trains through GANet_kernel.cu sga_*_backward)."""
    import jax
    import torch

    rng = np.random.RandomState(3)
    x_np = rng.randn(1, 2, 7, 5, 6).astype(np.float32)
    gs_np = [_rand_guidance(rng, 1, 5, 6) for _ in range(4)]

    xt = torch.tensor(x_np, requires_grad=True)
    gts = [torch.tensor(g, requires_grad=True) for g in gs_np]
    _torch_sga(xt, gts).pow(2).sum().backward()

    grads = jax.grad(lambda c, g0, g1, g2, g3:
                     jnp.sum(sga(c, g0, g1, g2, g3) ** 2),
                     argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x_np), *[jnp.asarray(g) for g in gs_np])

    np.testing.assert_allclose(np.asarray(grads[0]), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    for got, want in zip(grads[1:], gts):
        np.testing.assert_allclose(np.asarray(got), want.grad.numpy(),
                                   rtol=1e-4, atol=1e-4)


def _torch_nlf_direction(x, f):
    """Torch transcription of nlf_down_forward (NLF_kernel.cu:22-78):
    rows sequential, within-row left-to-right recursion, no in-place ops.
    x: (B, C, H, W); f: (B, 5, H, W)."""
    import torch

    h, w = x.shape[2], x.shape[3]
    rows = []
    prev = None
    for row in range(h):
        xr = x[:, :, row]                          # (B, C, W)
        fr = [f[:, i, None, row] for i in range(5)]  # (B, 1, W)
        cols = []
        for col in range(w):
            cur = xr[:, :, col]
            t = cur * fr[0][:, :, col]
            t = t + (prev[:, :, col] if prev is not None else cur) \
                * fr[1][:, :, col]
            t = t + (prev[:, :, col - 1] if prev is not None and col > 0
                     else cur) * fr[2][:, :, col]
            t = t + (prev[:, :, col + 1] if prev is not None and col + 1 < w
                     else cur) * fr[3][:, :, col]
            t = t + (cols[col - 1] if col > 0 else cur) * fr[4][:, :, col]
            cols.append(t)
        out_r = torch.stack(cols, dim=2)
        rows.append(out_r)
        prev = out_r
    return torch.stack(rows, dim=2)


def _torch_nlf_iter(x, gs):
    def swap23(g):
        import torch
        return torch.stack([g[:, 0], g[:, 1], g[:, 3], g[:, 2], g[:, 4]], 1)

    x = _torch_nlf_direction(x, gs[0])
    x = _torch_nlf_direction(x.flip(2, 3),
                             swap23(gs[1]).flip(2, 3)).flip(2, 3)
    x = _torch_nlf_direction(x.transpose(2, 3),
                             gs[2].transpose(2, 3)).transpose(2, 3)
    x = _torch_nlf_direction(x.flip(2, 3).transpose(2, 3),
                             swap23(gs[3]).flip(2, 3).transpose(2, 3)
                             ).transpose(2, 3).flip(2, 3)
    return x


def test_nlf_gradient_oracle():
    """jax.grad through the nlf associative-scan recurrences == torch
    autograd through the literal transcription (reference backward:
    NLF_kernel.cu nlf_*_backward)."""
    import jax
    import torch

    rng = np.random.RandomState(4)
    x_np = rng.randn(1, 3, 5, 6).astype(np.float32)
    gs_np = [_rand_guidance(rng, 1, 5, 6) for _ in range(4)]

    xt = torch.tensor(x_np, requires_grad=True)
    gts = [torch.tensor(g, requires_grad=True) for g in gs_np]
    _torch_nlf_iter(xt, gts).pow(2).sum().backward()

    grads = jax.grad(lambda x, g0, g1, g2, g3:
                     jnp.sum(nlf_iter(x, g0, g1, g2, g3) ** 2),
                     argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(x_np), *[jnp.asarray(g) for g in gs_np])

    np.testing.assert_allclose(np.asarray(grads[0]), xt.grad.numpy(),
                               rtol=1e-4, atol=1e-4)
    for got, want in zip(grads[1:], gts):
        np.testing.assert_allclose(np.asarray(got), want.grad.numpy(),
                                   rtol=1e-4, atol=1e-4)
