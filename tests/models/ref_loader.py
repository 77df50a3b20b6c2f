"""Import the *reference* ptlflow package itself as a torch oracle.

The reference depends on packages that are not installed in this sandbox
(lightning, loguru, torchmetrics, jsonargparse, timm, torchvision, cupy).
None of them matter for a CPU eval-mode forward: lightning only supplies
the training loop, torchmetrics the metric aggregation, loguru the logs.
So we install minimal stubs — just enough surface for the module-level
imports and ``BaseModel.__init__`` to run — and then import the real
``ptlflow`` from ``/root/reference``.

This gives every parity test the strongest possible oracle: the
reference's OWN ``forward`` (including ``preprocess_images`` /
``postprocess_predictions``, reference base_model.py:145-340), not a
hand-assembled transcription of it.
"""

from __future__ import annotations

import sys
import types

import torch


def _module(name):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def _install_lightning_stub():
    if getattr(sys.modules.get("lightning"), "_ref_oracle_stub", False):
        return

    class _AttributeDict(dict):
        """lightning's hparams container: dict + attribute access."""

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name) from None

        def __setattr__(self, name, value):
            self[name] = value

    class LightningModule(torch.nn.Module):
        """The subset of the Lightning API the reference BaseModel
        touches outside the training loop."""

        def __init__(self):
            super().__init__()
            self._hparams = _AttributeDict()

        def save_hyperparameters(self, *args, ignore=None, **kwargs):
            """Capture the full __init__ kwarg chain like lightning does
            (some reference models read them back, e.g. craft's
            SETransConfig.update_config(self._hparams))."""
            import inspect

            hparams = {}
            frame = inspect.currentframe().f_back
            # inner frames first so the most-derived __init__ wins
            while frame is not None:
                if (frame.f_code.co_name == "__init__"
                        and frame.f_locals.get("self") is self):
                    info = inspect.getargvalues(frame)
                    for name in info.args:
                        if name != "self":
                            hparams[name] = frame.f_locals.get(name)
                    if info.keywords:
                        kw = frame.f_locals.get(info.keywords) or {}
                        hparams.update(kw)
                frame = frame.f_back
            skip = set(ignore or [])
            self._hparams = _AttributeDict(
                {k: v for k, v in hparams.items() if k not in skip})

        @property
        def hparams(self):
            return self._hparams

        def log(self, *args, **kwargs):
            pass

        def log_dict(self, *args, **kwargs):
            pass

        @property
        def trainer(self):
            return None

        @property
        def global_step(self):
            return 0

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

        @property
        def dtype(self):
            try:
                return next(self.parameters()).dtype
            except StopIteration:
                return torch.float32

    class LightningDataModule:
        pass

    class Callback:
        pass

    lightning = _module("lightning")
    pl = _module("lightning.pytorch")
    pl.LightningModule = LightningModule
    pl.LightningDataModule = LightningDataModule
    pl.Callback = Callback
    cli = _module("lightning.pytorch.cli")
    cli.LightningCLI = object
    cli.LightningArgumentParser = object
    cbs = _module("lightning.pytorch.callbacks")
    cbs.Callback = Callback
    cbs.ModelCheckpoint = object
    utils = _module("lightning.pytorch.utilities")
    utils.rank_zero_only = lambda fn: fn
    lightning.pytorch = pl
    pl.cli = cli
    pl.callbacks = cbs
    pl.utilities = utils
    lightning._ref_oracle_stub = True


def _install_loguru_stub():
    if sys.modules.get("loguru") is not None:
        return
    loguru = _module("loguru")

    class _Logger:
        def _noop(self, *args, **kwargs):
            pass

        debug = info = warning = error = critical = trace = _noop
        success = exception = _noop

        def remove(self, *args, **kwargs):
            pass

        def add(self, *args, **kwargs):
            return 0

    loguru.logger = _Logger()


def _install_torchmetrics_stub():
    if sys.modules.get("torchmetrics") is not None:
        return
    tm = _module("torchmetrics")

    class Metric(torch.nn.Module):
        """Enough of torchmetrics.Metric for FlowMetrics: add_state
        registers a buffer-like attribute; __call__ = update."""

        full_state_update = False

        def __init__(self, **kwargs):
            super().__init__()
            self._defaults = {}

        def add_state(self, name, default, dist_reduce_fx=None):
            self._defaults[name] = default
            setattr(self, name, default.clone() if torch.is_tensor(default)
                    else list(default))

        def reset(self):
            for name, default in self._defaults.items():
                setattr(self, name,
                        default.clone() if torch.is_tensor(default)
                        else list(default))

        def forward(self, *args, **kwargs):
            self.update(*args, **kwargs)
            return self.compute()

    tm.Metric = Metric


def _install_jsonargparse_stub():
    if sys.modules.get("jsonargparse") is not None:
        return
    import argparse

    ja = _module("jsonargparse")
    ja.ArgumentParser = argparse.ArgumentParser
    ja.Namespace = argparse.Namespace
    ja.ActionConfigFile = object
    ja.lazy_instance = lambda cls, **kw: None


def _install_cupy_stub():
    """splatflow/softsplat.py imports cupy unconditionally and decorates
    module-level functions with @cupy.memoize; the CUDA path is never
    executed on CPU."""
    if sys.modules.get("cupy") is not None:
        return
    cupy = _module("cupy")

    def memoize(for_each_device=False):
        def deco(fn):
            return fn

        return deco

    cupy.memoize = memoize
    cupy.RawKernel = object

    class _NeverInstantiated:
        """einops probes installed backends with isinstance(x,
        cupy.ndarray); give it a class nothing is an instance of."""

    cupy.ndarray = _NeverInstantiated


def _install_torchvision_extras():
    """Enrich the suite's torchvision stub (installed by
    tests/models/conftest.py) with the pieces the reference model files
    import at module level: transforms.functional.resize (ccmr,
    ms_raft_plus) and a *working* ops.DeformConv2d (maskflownet)."""
    tv = _module("torchvision")
    if getattr(tv, "_ref_oracle_extras", False):
        return
    import torch.nn.functional as F

    tf_mod = _module("torchvision.transforms")
    tff = _module("torchvision.transforms.functional")

    def resize(img, size, interpolation=None, antialias=True):
        return F.interpolate(img, size=tuple(size), mode="bilinear",
                             align_corners=False,
                             antialias=bool(antialias))

    tff.resize = resize
    tf_mod.functional = tff

    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    tf_mod.Compose = Compose
    tv.transforms = tf_mod

    class DeformConv2d(torch.nn.Module):
        """Pure-torch deformable conv (torchvision.ops semantics:
        per-location (dy, dx) offsets, bilinear sampling with zeros
        outside). Matches the numpy oracle in test_maskflownet."""

        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, dilation=1, groups=1, bias=True):
            super().__init__()
            self.in_channels = in_channels
            self.out_channels = out_channels
            k = (kernel_size if isinstance(kernel_size, (tuple, list))
                 else (kernel_size, kernel_size))
            self.kernel_size = k
            self.stride = (stride if isinstance(stride, (tuple, list))
                           else (stride, stride))
            self.padding = (padding if isinstance(padding, (tuple, list))
                            else (padding, padding))
            self.dilation = (dilation if isinstance(dilation, (tuple, list))
                             else (dilation, dilation))
            self.groups = groups
            self.weight = torch.nn.Parameter(
                torch.empty(out_channels, in_channels // groups, *k))
            torch.nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)
            if bias:
                self.bias = torch.nn.Parameter(torch.zeros(out_channels))
            else:
                self.register_parameter("bias", None)

        def forward(self, x, offset, mask=None):
            b, c, h, w = x.shape
            kh, kw = self.kernel_size
            sh, sw = self.stride
            ph, pw = self.padding
            dh, dw = self.dilation
            oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
            ow = (w + 2 * pw - dw * (kw - 1) - 1) // sw + 1
            # base sampling grid per kernel tap: (oh, ow, kh, kw)
            ys = torch.arange(oh, dtype=x.dtype) * sh - ph
            xs = torch.arange(ow, dtype=x.dtype) * sw - pw
            kys = torch.arange(kh, dtype=x.dtype) * dh
            kxs = torch.arange(kw, dtype=x.dtype) * dw
            base_y = ys[:, None, None, None] + kys[None, None, :, None]
            base_x = xs[None, :, None, None] + kxs[None, None, None, :]
            off = offset.reshape(b, kh * kw, 2, oh, ow)
            oy = off[:, :, 0].permute(0, 2, 3, 1).reshape(b, oh, ow, kh, kw)
            ox = off[:, :, 1].permute(0, 2, 3, 1).reshape(b, oh, ow, kh, kw)
            py = base_y.unsqueeze(0) + oy  # (b, oh, ow, kh, kw)
            px = base_x.unsqueeze(0) + ox
            # grid_sample with zeros padding == bilinear w/ zeros outside
            gx = 2 * px / max(w - 1, 1) - 1
            gy = 2 * py / max(h - 1, 1) - 1
            grid = torch.stack([gx, gy], dim=-1).reshape(
                b, oh, ow * kh * kw, 2)
            sampled = F.grid_sample(x, grid, mode="bilinear",
                                    padding_mode="zeros",
                                    align_corners=True)
            sampled = sampled.reshape(b, c, oh, ow, kh, kw)
            if mask is not None:
                m = mask.reshape(b, kh * kw, oh, ow).permute(0, 2, 3, 1)
                m = m.reshape(b, 1, oh, ow, kh, kw)
                sampled = sampled * m
            out = torch.einsum("bchwkl,ockl->bohw",
                               sampled.reshape(b, c, oh, ow, kh, kw),
                               self.weight)
            if self.bias is not None:
                out = out + self.bias[None, :, None, None]
            return out

    ops = _module("torchvision.ops")
    ops.DeformConv2d = DeformConv2d
    tv.ops = ops
    # bare constructors on top of the suite stub's get_model
    tvm = tv.models
    if not hasattr(tvm, "resnet18"):
        tvm.resnet18 = lambda weights=None: tvm.get_model("resnet18")
        tvm.resnet34 = lambda weights=None: tvm.get_model("resnet34")
    tv._ref_oracle_extras = True


def _install_timm_extras():
    """The vendored timm0412 inside flowformerplusplus imports a few
    extra names from the *installed* timm (here: the suite's stub)."""
    timm = _module("timm")
    if not hasattr(timm, "__version__"):
        timm.__version__ = "0.4.12"
    data = getattr(timm, "data", None) or _module("timm.data")
    data.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
    data.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)
    if not hasattr(data, "IMAGENET_DEFAULT_MEAN"):
        data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
        data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm.data = data

    def create_model(name, pretrained=False, **kwargs):
        """Back timm.create_model with the reference's OWN vendored
        twins copy (flowformer/twins.py — identical param layout to the
        timm checkpoint the real encoders.py loads)."""
        if name.startswith("vit_"):
            # waft's VisionTransformer (backbone/vit.py:34-52) only
            # takes .blocks and .embed_dim off the timm ViT; build the
            # standard pre-norm blocks from the stub's Attention/Mlp
            # (timm param names: norm1/attn.qkv/attn.proj/norm2/mlp.fc*).
            cfg = {"vit_tiny_patch16_224": (192, 12, 3),
                   "vit_small_patch16_224": (384, 12, 6),
                   "vit_base_patch16_224": (768, 12, 12),
                   "vit_large_patch16_224": (1024, 24, 16)}[name]
            dim, depth, heads = cfg
            from timm.models.vision_transformer import Attention
            from timm.layers import Mlp

            class ViTBlock(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.norm1 = torch.nn.LayerNorm(dim, eps=1e-6)
                    self.attn = Attention(dim, heads, qkv_bias=True)
                    self.norm2 = torch.nn.LayerNorm(dim, eps=1e-6)
                    self.mlp = Mlp(dim, dim * 4)

                def forward(self, x):
                    x = x + self.attn(self.norm1(x))
                    return x + self.mlp(self.norm2(x))

            vit = torch.nn.Module()
            vit.blocks = torch.nn.ModuleList(
                [ViTBlock() for _ in range(depth)])
            vit.embed_dim = dim
            return vit
        if name.startswith("resnet18"):
            # waft_a1/a2 only slice .layer1-4 off a features_only
            # resnet18 (waft_a1.py:41-51); the suite's stub ResNet has
            # the same block structure and timm param names.
            tv = sys.modules["torchvision"]
            return tv.models.get_model("resnet18")
        if name != "twins_svt_large":
            raise NotImplementedError(f"timm stub: {name}")
        import importlib.util

        pkg_name = "_ref_flowformer_vendor"
        pkg = sys.modules.get(pkg_name)
        if pkg is None:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = ["/root/reference/ptlflow/models/flowformer"]
            sys.modules[pkg_name] = pkg
        mod = sys.modules.get(f"{pkg_name}.twins")
        if mod is None:
            spec = importlib.util.spec_from_file_location(
                f"{pkg_name}.twins",
                "/root/reference/ptlflow/models/flowformer/twins.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"{pkg_name}.twins"] = mod
            spec.loader.exec_module(mod)
            # The vendored Block.forward always passes a context arg;
            # the plain (non-RPE) attn classes the svt_large config
            # instantiates don't accept one.  Param-free shim.
            for cls in (mod.LocallyGroupedAttn, mod.GlobalSubSampleAttn):
                orig = cls.forward

                def fwd(self, x, size, context=None, _orig=orig):
                    return _orig(self, x, size)

                cls.forward = fwd
        if kwargs.pop("features_only", False):
            # timm features_only contract (waft backbone/twins.py:180):
            # forward returns the four stage maps as NCHW tensors.
            class TwinsFeatures(mod.Twins):
                def forward(self, x):
                    outs = []
                    B = x.shape[0]
                    for embed, drop, blocks, pos_blk in zip(
                            self.patch_embeds, self.pos_drops,
                            self.blocks, self.pos_block):
                        x, size = embed(x)
                        x = drop(x)
                        for j, blk in enumerate(blocks):
                            x = blk(x, size)
                            if j == 0:
                                x = pos_blk(x, size)
                        x = (x.reshape(B, *size, -1)
                             .permute(0, 3, 1, 2).contiguous())
                        outs.append(x)
                    return outs

            return TwinsFeatures(
                patch_size=4, embed_dims=[128, 256, 512, 1024],
                num_heads=[4, 8, 16, 32], mlp_ratios=[4, 4, 4, 4],
                depths=[2, 2, 18, 2], wss=[7, 7, 7, 7],
                sr_ratios=[8, 4, 2, 1], num_classes=0, **kwargs)
        return mod.Twins(
            patch_size=4, embed_dims=[128, 256, 512, 1024],
            num_heads=[4, 8, 16, 32], mlp_ratios=[4, 4, 4, 4],
            depths=[2, 2, 18, 2], wss=[7, 7, 7, 7],
            sr_ratios=[8, 4, 2, 1], **kwargs)

    if not hasattr(timm, "create_model"):
        timm.create_model = create_model


def _install_faiss_stub():
    """scv's knn.py only needs the module to import; the actual
    brute-force inner-product top-k is replaced post-import (see
    load_ref_ptlflow) with an exact torch equivalent."""
    if sys.modules.get("faiss") is not None:
        return
    faiss = _module("faiss")

    class _Res:
        def setDefaultNullStreamAllDevices(self):
            pass

    faiss.StandardGpuResources = _Res
    faiss.METRIC_L2 = 1
    faiss.METRIC_INNER_PRODUCT = 0
    faiss.GpuDistanceParams = object


def _exact_knn_faiss_raw(fmap1, fmap2, k):
    """Exact replacement for scv/knn.py:88-118 (faiss bfKnn, inner
    product): top-k of f1 . f2 per query.  fmap1/fmap2 (B, C, N);
    returns (dist, indx) each (B, k, N) like the original."""
    corr = torch.einsum("bcn,bcm->bnm", fmap1, fmap2)
    dist, indx = corr.topk(k, dim=2)  # (B, N, k), descending
    return (dist.permute(0, 2, 1).contiguous(),
            indx.permute(0, 2, 1).contiguous())


def _install_torch_scatter_stub():
    """scatter_softmax / scatter_add on plain torch (exact math): the
    reference scv family needs them (scv/utils.py:7)."""
    if sys.modules.get("torch_scatter") is not None:
        return
    ts = _module("torch_scatter")

    def _broadcast(index, src, dim):
        if index.dim() == 1:
            for _ in range(index.dim(), src.dim()):
                index = index.unsqueeze(-1)
        return index.expand_as(src)

    def scatter_add(src, index, dim=0, out=None, dim_size=None):
        index = _broadcast(index, src, dim)
        if dim_size is None:
            dim_size = int(index.max()) + 1 if index.numel() else 0
        size = list(src.shape)
        size[dim] = dim_size
        base = torch.zeros(size, dtype=src.dtype) if out is None else out
        return base.scatter_add(dim, index, src)

    def scatter_max(src, index, dim=0, dim_size=None):
        index = _broadcast(index, src, dim)
        if dim_size is None:
            dim_size = int(index.max()) + 1 if index.numel() else 0
        size = list(src.shape)
        size[dim] = dim_size
        out = torch.full(size, float("-inf"), dtype=src.dtype)
        out = out.scatter_reduce(dim, index, src, reduce="amax",
                                 include_self=True)
        return out, None

    def scatter_softmax(src, index, dim=0):
        idx = _broadcast(index, src, dim)
        mx, _ = scatter_max(src, index, dim)
        src_s = src - mx.gather(dim, idx)
        ex = src_s.exp()
        den = scatter_add(ex, index, dim)
        return ex / den.gather(dim, idx).clamp_min(1e-16)

    ts.scatter_add = scatter_add
    ts.scatter_max = scatter_max
    ts.scatter_softmax = scatter_softmax


def install_ref_stubs():
    """Install every stub plus the rich timm/torchvision fakes already
    maintained by the test suite (conftest installs those on import)."""
    _install_lightning_stub()
    _install_loguru_stub()
    _install_torchmetrics_stub()
    _install_jsonargparse_stub()
    _install_cupy_stub()
    _install_faiss_stub()
    _install_torch_scatter_stub()
    # rich fakes maintained elsewhere in the suite
    from tests.models.test_memfof import (
        _install_torchvision_stub as _tv_resnet_stub)
    from tests.models.test_recover import (
        _install_torchvision_stub as _tv_mobilenet_stub)
    from tests.models.test_flowformer import _install_timm_stub

    _tv_resnet_stub()
    _tv_mobilenet_stub()
    _install_timm_stub()
    _install_torchvision_extras()
    _install_timm_extras()


_REF_ROOT = "/root/reference"
_ref_ptlflow = None


def load_ref_ptlflow():
    """Import the reference ptlflow package (cached)."""
    global _ref_ptlflow
    if _ref_ptlflow is not None:
        return _ref_ptlflow
    install_ref_stubs()
    if _REF_ROOT not in sys.path:
        sys.path.insert(0, _REF_ROOT)
    import ptlflow as ref_ptlflow  # noqa: the reference package

    assert ref_ptlflow.__file__.startswith(_REF_ROOT), ref_ptlflow.__file__
    # swap the faiss-pointer knn for the exact torch equivalent
    for modname in ("ptlflow.models.scv.knn",
                    "ptlflow.models.scv.compute_sparse_correlation",
                    "ptlflow.models.scv.scv",
                    "ptlflow.models.scv.utils"):
        mod = sys.modules.get(modname)
        if mod is not None and hasattr(mod, "knn_faiss_raw"):
            mod.knn_faiss_raw = _exact_knn_faiss_raw
    _ref_ptlflow = ref_ptlflow
    return ref_ptlflow


def build_ref_model(name: str, randomize_seed: int | None = None,
                    std: float = 0.05, **args):
    """Instantiate the reference model ``name`` with default args (plus
    overrides), in eval mode, optionally with N(0, std) randomized
    weights (deterministic per seed)."""
    ref = load_ref_ptlflow()
    cls = ref.get_model_reference(name)
    # jsonargparse materializes Sequence defaults as lists; some reference
    # extractors mutate them in place (e.g. sea_raft extractor.py:33), so
    # direct construction with the tuple default would crash.  Walk the
    # whole MRO: variant classes (e.g. recover_mn) often define a thin
    # __init__(**kwargs) that hides the parent signature carrying the
    # tuple default.
    import inspect

    tuple_defaults = {}
    for klass in reversed(cls.__mro__):
        init = klass.__dict__.get("__init__")
        if init is None:
            continue
        try:
            sig = inspect.signature(init)
        except (TypeError, ValueError):
            continue
        for pname, p in sig.parameters.items():
            if isinstance(p.default, tuple):
                tuple_defaults[pname] = list(p.default)
    injected = [p for p in tuple_defaults if p not in args]
    for pname in injected:
        args[pname] = tuple_defaults[pname]
    try:
        model = cls(**args).eval()
    except TypeError:
        # some __init__ chain rejects a forwarded default: drop the
        # injected ones and construct with the caller's args only
        for pname in injected:
            args.pop(pname, None)
        model = cls(**args).eval()
    if randomize_seed is not None:
        torch.manual_seed(randomize_seed)
        with torch.no_grad():
            for p in model.parameters():
                p.normal_(0, std)
    return model
