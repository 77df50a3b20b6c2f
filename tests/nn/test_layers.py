"""Layer parity vs torch, including torch state_dict conversion round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from ptlflow_tpu import nn


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def from_np_nchw(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _state_dict_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


@pytest.mark.parametrize("ksize,stride,pad,dilation,groups,bias", [
    (3, 1, 1, 1, 1, True),
    ((1, 5), 1, (0, 2), 1, 1, True),
    ((5, 1), 1, (2, 0), 1, 1, False),
    (7, 2, 3, 1, 1, True),
    (3, 1, 2, 2, 1, True),
    (3, 1, 1, 1, 4, True),
])
def test_conv2d_matches_torch(ksize, stride, pad, dilation, groups, bias):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 11, 13).astype(np.float32)
    t_conv = tnn.Conv2d(8, 16, ksize, stride=stride, padding=pad,
                        dilation=dilation, groups=groups, bias=bias)
    j_conv = nn.Conv2d(8, 16, ksize, stride=stride, padding=pad,
                       dilation=dilation, groups=groups, bias=bias)
    params = j_conv.from_torch(_state_dict_np(t_conv))
    out = j_conv(params, from_np_nchw(x))
    ref = to_nhwc(t_conv(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_conv2d_replicate_padding():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 9, 9).astype(np.float32)
    t_conv = tnn.Conv2d(4, 6, 3, padding=1, padding_mode="replicate")
    j_conv = nn.Conv2d(4, 6, 3, padding=1, padding_mode="replicate")
    params = j_conv.from_torch(_state_dict_np(t_conv))
    out = j_conv(params, from_np_nchw(x))
    ref = to_nhwc(t_conv(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("stride,pad,outpad", [(2, 1, 0), (2, 0, 0), (4, 1, 1)])
def test_conv_transpose2d_matches_torch(stride, pad, outpad):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 6, 7).astype(np.float32)
    t_conv = tnn.ConvTranspose2d(5, 8, 4, stride=stride, padding=pad,
                                 output_padding=outpad)
    j_conv = nn.ConvTranspose2d(5, 8, 4, stride=stride, padding=pad,
                                output_padding=outpad)
    params = j_conv.from_torch(_state_dict_np(t_conv))
    out = j_conv(params, from_np_nchw(x))
    ref = to_nhwc(t_conv(torch.from_numpy(x)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_linear_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 10).astype(np.float32)
    t_lin = tnn.Linear(10, 7)
    j_lin = nn.Linear(10, 7)
    params = j_lin.from_torch(_state_dict_np(t_lin))
    out = j_lin(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), t_lin(torch.from_numpy(x)).detach().numpy(),
        atol=1e-5)


def test_batchnorm_eval_and_train():
    rng = np.random.RandomState(4)
    x = rng.randn(3, 6, 7, 5).astype(np.float32) * 2 + 1
    t_bn = tnn.BatchNorm2d(5)
    # randomize stats/affine
    t_bn.running_mean.data = torch.from_numpy(rng.randn(5).astype(np.float32))
    t_bn.running_var.data = torch.from_numpy(
        np.abs(rng.randn(5)).astype(np.float32) + 0.5)
    t_bn.weight.data = torch.from_numpy(rng.randn(5).astype(np.float32))
    t_bn.bias.data = torch.from_numpy(rng.randn(5).astype(np.float32))

    j_bn = nn.BatchNorm2d(5)
    params = j_bn.from_torch(_state_dict_np(t_bn))

    # eval mode
    t_bn.eval()
    x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = to_nhwc(t_bn(x_t))
    out = j_bn(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    # train mode: output uses batch stats, running stats updated
    t_bn.train()
    ref_train = to_nhwc(t_bn(x_t))
    params2 = nn.tree_copy(params)
    out_train = j_bn(params2, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(out_train), ref_train, atol=1e-4)
    np.testing.assert_allclose(np.asarray(params2["running_mean"]),
                               t_bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(params2["running_var"]),
                               t_bn.running_var.numpy(), atol=1e-4)


def test_instancenorm_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 6, 7, 4).astype(np.float32)
    t_in = tnn.InstanceNorm2d(4)
    j_in = nn.InstanceNorm2d(4)
    ref = to_nhwc(t_in(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    out = j_in({}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_groupnorm_matches_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 5, 6, 8).astype(np.float32)
    t_gn = tnn.GroupNorm(4, 8)
    t_gn.weight.data = torch.from_numpy(rng.randn(8).astype(np.float32))
    t_gn.bias.data = torch.from_numpy(rng.randn(8).astype(np.float32))
    j_gn = nn.GroupNorm(4, 8)
    params = j_gn.from_torch(_state_dict_np(t_gn))
    ref = to_nhwc(t_gn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))))
    out = j_gn(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_sequential_torch_conversion():
    t_seq = tnn.Sequential(
        tnn.Conv2d(3, 8, 3, padding=1), tnn.ReLU(), tnn.Conv2d(8, 4, 1))
    j_seq = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1), nn.relu, nn.Conv2d(8, 4, 1))
    params = j_seq.from_torch(_state_dict_np(t_seq))
    rng = np.random.RandomState(7)
    x = rng.randn(1, 3, 6, 6).astype(np.float32)
    ref = to_nhwc(t_seq(torch.from_numpy(x)))
    out = j_seq(params, from_np_nchw(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_avg_max_pool_match_torch():
    import torch.nn.functional as F
    from ptlflow_tpu.nn import avg_pool2d, max_pool2d
    rng = np.random.RandomState(8)
    x = rng.randn(2, 4, 9, 7).astype(np.float32)
    x_t = torch.from_numpy(x)
    ref_avg = to_nhwc(F.avg_pool2d(x_t, 2, 2))
    out_avg = avg_pool2d(from_np_nchw(x), 2, 2)
    np.testing.assert_allclose(np.asarray(out_avg), ref_avg, atol=1e-6)
    ref_max = to_nhwc(F.max_pool2d(x_t, 3, 2, 1))
    out_max = max_pool2d(from_np_nchw(x), 3, 2, 1)
    np.testing.assert_allclose(np.asarray(out_max), ref_max, atol=1e-6)


def test_split_merge_trainable():
    model = nn.Sequential(nn.Conv2d(3, 4, 3, padding=1), nn.BatchNorm2d(4))
    params = model.init(jax.random.PRNGKey(0))
    train, state = nn.split_trainable(params)
    flat_state = nn.flatten_params(state)
    assert set(flat_state) == {"1.running_mean", "1.running_var"}
    merged = nn.merge_params(train, state)
    f0 = nn.flatten_params(params)
    f1 = nn.flatten_params(merged)
    assert set(f0) == set(f1)


@pytest.mark.parametrize("kernel,stride,pad,d", [
    ((3, 3, 3), 1, 1, 13), ((3, 3, 3), 2, 1, 97), ((1, 3, 3), 1, (0, 1, 1), 8),
])
def test_conv3d_matches_torch(kernel, stride, pad, d):
    import torch
    rng = np.random.RandomState(3)
    conv = nn.Conv3d(5, 7, kernel, stride=stride, padding=pad, bias=True)
    tconv = torch.nn.Conv3d(5, 7, kernel, stride=stride, padding=pad,
                            bias=True)
    params = conv.from_torch(tconv.state_dict())
    x = rng.randn(2, d, 6, 9, 5).astype(np.float32)
    ref = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).detach() \
        .permute(0, 2, 3, 4, 1).numpy()
    out = np.asarray(conv(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("kernel,stride,pad,outpad,d", [
    ((4, 4, 4), 2, 1, 0, 13), ((3, 4, 4), 2, 1, 0, 25), ((3, 3, 3), 1, 1, 0, 8),
    ((4, 4, 4), 2, 1, 1, 9),
])
def test_conv_transpose3d_matches_torch(kernel, stride, pad, outpad, d):
    import torch
    rng = np.random.RandomState(4)
    conv = nn.ConvTranspose3d(5, 7, kernel, stride=stride, padding=pad,
                              output_padding=outpad, bias=True)
    tconv = torch.nn.ConvTranspose3d(5, 7, kernel, stride=stride, padding=pad,
                                     output_padding=outpad, bias=True)
    params = conv.from_torch(tconv.state_dict())
    x = rng.randn(2, d, 6, 9, 5).astype(np.float32)
    ref = tconv(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).detach() \
        .permute(0, 2, 3, 4, 1).numpy()
    out = np.asarray(conv(params, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)
