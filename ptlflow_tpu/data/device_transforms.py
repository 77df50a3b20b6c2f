"""Device-side (jitted) training augmentation.

The reference's ``train_transform_cuda`` (flow_datamodule.py:318 etc.) moves
the per-sample augmentation pipeline onto the accelerator by building the
transforms with ``ToTensor(device='cuda')``; the CPU loader then only
decodes.  The TPU analog here compiles the whole Compose pipeline into ONE
jitted function per input shape: scale+crop collapse into a single
``jax.image.scale_and_translate`` (static output = crop size, traced scale/
offset), and color jitter / noise / eraser / flip are elementwise.

Randomness is sampled on the host with the same ``random``-module calls as
the numpy pipeline (``transforms.py``), so the augmentation *distribution*
is identical; the random scalars enter the jitted function as traced
arguments.  The Gaussian-noise field alone uses ``jax.random`` (device
generation beats shipping an HxW field from the host).

Unsupported members (sparse scatter resize for KITTI-style GT,
GenerateFBCheckFlowOcclusion) make ``from_compose`` return None and the
caller falls back to the numpy pipeline.
"""

from __future__ import annotations

import random
from functools import partial
from typing import Dict, Optional

import numpy as np

from . import transforms as ft

BINARY_KEYS = ft.BINARY_KEYS
FLOW_KEYS = ft.FLOW_KEYS
OCC_KEYS = ft.OCC_KEYS

_MAX_PATCHES = 8


def _scale_crop_one(v, key, crop, sy, sx, y0, x0, method):
    """out[o] = v[(o + off)/s] via scale_and_translate (translation=-off)."""
    import jax.numpy as jnp
    from jax.image import scale_and_translate

    n, c = v.shape[0], v.shape[1]
    h, w = v.shape[2], v.shape[3]
    if method == "nearest":
        # scale_and_translate has no nearest mode; two axis takes replicate
        # the numpy pipeline's floor-index nearest resize + integer crop
        iy = jnp.clip(jnp.floor(
            (jnp.arange(crop[0]) + y0) / sy).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(jnp.floor(
            (jnp.arange(crop[1]) + x0) / sx).astype(jnp.int32), 0, w - 1)
        return jnp.take(jnp.take(v, iy, axis=2), ix, axis=3)
    flat = v.reshape(n * c, h, w)
    out = scale_and_translate(
        flat, (n * c, crop[0], crop[1]), (1, 2),
        jnp.stack([sy, sx]), jnp.stack([-y0, -x0]), method,
        antialias=False)  # the numpy pipeline's bilinear has no antialias
    return out.reshape(n, c, crop[0], crop[1])


def _apply_pipeline(sample, rnd, noise_seed, *, crop, steps, max_frames):
    """The jitted body. ``rnd`` is a flat vector of host-sampled scalars in
    the exact order _draw_randoms produced them; ``steps`` is the static
    tuple of (name, params) describing the pipeline."""
    import jax
    import jax.numpy as jnp

    sample = dict(sample)
    r = {"i": 0}

    def take(k=1):
        i = r["i"]
        r["i"] += k
        return rnd[i] if k == 1 else rnd[i:i + k]

    luma = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)[None, :, None,
                                                           None]

    def jitter_ops(imgs, fac, do):
        """brightness/contrast/saturation/hue with factors ``fac`` (4,) in a
        host-fixed order encoded by ``do`` (4,) op ids (static order is
        baked by tracing: ops execute in rnd order sampled on host)."""
        for slot in range(4):
            op = do[slot]
            f = fac[slot]

            def bright(x):
                return x * f

            def contrast(x):
                gray = (x * luma).sum(axis=1, keepdims=True)
                mean = gray.mean(axis=(1, 2, 3), keepdims=True)
                return (x - mean) * f + mean

            def sat(x):
                gray = (x * luma).sum(axis=1, keepdims=True)
                return (x - gray) * f + gray

            def hue(x):
                return _shift_hue_jnp(x, f)

            imgs = jax.lax.switch(op, [bright, contrast, sat, hue], imgs)
            imgs = jnp.clip(imgs, 0.0, 1.0)
        return imgs

    for name, params in steps:
        if name == "scale_crop":
            ref_key = "flows" if "flows" in sample else "images"
            h, w = sample[ref_key].shape[2:4]
            major = take()
            ssh, ssw = take(), take()
            sy = jnp.maximum(major * ssh, (crop[0] + 1e-3) / h)
            sx = jnp.maximum(major * ssw, (crop[1] + 1e-3) / w)
            y0 = take() * (h * sy - crop[0])   # uniform [0, scaled-crop]
            x0 = take() * (w * sx - crop[1])
            for k, v in sample.items():
                method = "nearest" if k in BINARY_KEYS else "linear"
                out = _scale_crop_one(v, k, crop, sy, sx, y0, x0, method)
                if k in FLOW_KEYS:
                    out = out * jnp.stack([sx, sy]).reshape(1, 2, 1, 1)
                sample[k] = out
            for occ_key, flow_key in zip(OCC_KEYS, FLOW_KEYS):
                if occ_key in sample and flow_key in sample:
                    sample[occ_key] = _update_oob_flows_jnp(
                        sample[occ_key], sample[flow_key])
        elif name == "jitter":
            imgs = sample["images"]
            asym = take()
            order = jnp.asarray(take(4), jnp.int32)
            # factors: (max_frames, 4) — frame f uses row f when asymmetric,
            # row 0 otherwise
            fac = take(4 * max_frames).reshape(max_frames, 4)
            n = imgs.shape[0]
            sym = jitter_ops(imgs, fac[0], order)
            per = [jitter_ops(imgs[i:i + 1], fac[min(i, max_frames - 1)],
                              order)
                   for i in range(n)]
            asym_imgs = jnp.concatenate(per, axis=0)
            sample["images"] = jnp.where(asym < params["asymmetric_prob"],
                                         asym_imgs, sym)
        elif name == "noise":
            import jax.random as jr

            std = take() * params["stdev"]
            v = sample["images"]
            noise = std * jr.normal(jr.PRNGKey(0).at[1].set(noise_seed),
                                    v.shape, v.dtype)
            sample["images"] = jnp.clip(v + noise, 0.0, 1.0)
        elif name == "eraser":
            imgs = sample["images"]
            if imgs.shape[0] < 2:
                continue
            do = take()
            rects = take(4 * _MAX_PATCHES).reshape(_MAX_PATCHES, 4)
            active = take(_MAX_PATCHES)
            img2 = imgs[1]
            c, h, w = img2.shape
            mean_color = img2.reshape(c, -1).mean(axis=1)
            yy = jnp.arange(h)[:, None]
            xx = jnp.arange(w)[None, :]
            for p in range(params["num_patches"]):
                dy, dx, fy, fx = rects[p]
                py = fy * (h - dy)
                px = fx * (w - dx)
                mask = ((yy >= py) & (yy < py + dy)
                        & (xx >= px) & (xx < px + dx))
                mask = mask & (do < params["prob"]) & (active[p] > 0)
                img2 = jnp.where(mask[None], mean_color[:, None, None],
                                 img2)
            sample["images"] = imgs.at[1].set(img2)
        elif name == "flip":
            fh = take() < params["ph"]
            fv = take() < params["pv"]
            for k, v in sample.items():
                hflip = v[..., ::-1]
                if k in FLOW_KEYS:
                    hflip = hflip * jnp.asarray([-1.0, 1.0],
                                                v.dtype).reshape(1, 2, 1, 1)
                v = jnp.where(fh, hflip, v)
                vflip = v[..., ::-1, :]
                if k in FLOW_KEYS:
                    vflip = vflip * jnp.asarray([1.0, -1.0],
                                                v.dtype).reshape(1, 2, 1, 1)
                sample[k] = jnp.where(fv, vflip, v)
    return sample


def _shift_hue_jnp(imgs, shift):
    """(N, 3, H, W) hue shift — jnp port of transforms._shift_hue."""
    import jax.numpy as jnp

    r, g, b = imgs[:, 0], imgs[:, 1], imgs[:, 2]
    maxc = imgs.max(axis=1)
    minc = imgs.min(axis=1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rc = jnp.where(delta > 0, (maxc - r) / jnp.maximum(delta, 1e-12), 0.0)
    gc = jnp.where(delta > 0, (maxc - g) / jnp.maximum(delta, 1e-12), 0.0)
    bc = jnp.where(delta > 0, (maxc - b) / jnp.maximum(delta, 1e-12), 0.0)
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    cands_r = jnp.stack([v, q, p, p, t, v])
    cands_g = jnp.stack([t, v, v, q, p, p])
    cands_b = jnp.stack([p, p, t, v, v, q])
    r2 = jnp.take_along_axis(cands_r, i[None], axis=0)[0]
    g2 = jnp.take_along_axis(cands_g, i[None], axis=0)[0]
    b2 = jnp.take_along_axis(cands_b, i[None], axis=0)[0]
    return jnp.stack([r2, g2, b2], axis=1)


def _update_oob_flows_jnp(occs, flows):
    import jax.numpy as jnp

    n, _, h, w = flows.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=flows.dtype),
                          jnp.arange(w, dtype=flows.dtype), indexing="ij")
    cx = flows[:, 0] + gx
    cy = flows[:, 1] + gy
    oob = (cx < 0) | (cx > w) | (cy < 0) | (cy > h)
    return jnp.maximum(occs, oob[:, None].astype(occs.dtype))


class DeviceCompose:
    """Jitted equivalent of an ``ft.Compose`` training pipeline.

    Use :meth:`from_compose`; returns None when the pipeline contains a
    member with no device equivalent (the caller keeps the numpy path).
    """

    def __init__(self, steps, crop, max_frames: int = 2,
                 out_dtype=None):
        self.steps = tuple(steps)
        self.crop = crop
        self.max_frames = max_frames
        # the reference's train_transform_fp16 halves transform-output
        # precision (flow_datamodule.py train_transform_fp16); bf16 here
        self.out_dtype = out_dtype
        import jax

        self._fn = jax.jit(partial(_apply_pipeline, crop=crop,
                                   steps=self.steps,
                                   max_frames=max_frames))
        self._seed = 0

    @classmethod
    def from_compose(cls, compose: ft.Compose, max_frames: int = 2,
                     out_dtype=None) -> Optional["DeviceCompose"]:
        steps = []
        crop = None
        for t in compose.transforms:
            if isinstance(t, ft.RandomScaleAndCrop):
                if t.sparse or t.crop_size is None:
                    return None  # scatter resize stays on host
                crop = tuple(t.crop_size)
                steps.append(("scale_crop",
                              {"major": t.major_scale,
                               "space": t.space_scale}))
            elif isinstance(t, ft.ColorJitter):
                steps.append(("jitter", {
                    "brightness": t.brightness, "contrast": t.contrast,
                    "saturation": t.saturation, "hue": t.hue,
                    "asymmetric_prob": t.asymmetric_prob}))
            elif isinstance(t, ft.GaussianNoise):
                steps.append(("noise", {"stdev": t.stdev}))
            elif isinstance(t, ft.RandomPatchEraser):
                if t.noise_type != "mean" or t.num_patches > _MAX_PATCHES:
                    return None
                steps.append(("eraser", {
                    "prob": t.prob, "bounds": t.bounds,
                    "num_patches": t.num_patches}))
            elif isinstance(t, ft.RandomFlip):
                steps.append(("flip", {"ph": t.ph, "pv": t.pv}))
            elif isinstance(t, ft.ToTensor):
                continue
            else:
                return None
        if crop is None:
            return None
        return cls(steps, crop, max_frames, out_dtype=out_dtype)

    # ----------------------------------------------------------- randomness
    def _draw_randoms(self, sample) -> np.ndarray:
        """Host-side draws, one flat vector, in _apply_pipeline's order.
        Uses the same ``random`` module and the same per-op sampling as the
        numpy pipeline so the augmentation distribution matches."""
        out = []
        h, w = sample["images"].shape[-2:]
        for name, params in self.steps:
            if name == "scale_crop":
                h, w = self.crop
                out.append(2 ** random.uniform(*params["major"]))
                out.append(2 ** random.uniform(params["space"][0],
                                               params["space"][1]))
                out.append(2 ** random.uniform(params["space"][2],
                                               params["space"][3]))
                out.append(random.random())   # y0 fraction
                out.append(random.random())   # x0 fraction
            elif name == "jitter":
                out.append(random.random())   # asymmetric draw
                order = list(range(4))
                random.shuffle(order)
                out.extend(order)
                for _ in range(self.max_frames):
                    fac = {0: random.uniform(*params["brightness"]),
                           1: random.uniform(*params["contrast"]),
                           2: random.uniform(*params["saturation"]),
                           3: random.uniform(*params["hue"])}
                    out.extend(fac[o] for o in order)
            elif name == "noise":
                out.append(random.random())
            elif name == "eraser":
                out.append(random.random())   # prob draw
                b = params["bounds"]
                for _ in range(_MAX_PATCHES):
                    out.append(random.randint(b[0][0],
                                              max(b[0][0],
                                                  min(b[0][1], h - 1))))
                    out.append(random.randint(b[1][0],
                                              max(b[1][0],
                                                  min(b[1][1], w - 1))))
                    out.append(random.random())                   # fy
                    out.append(random.random())                   # fx
                n_act = random.randint(1, params["num_patches"])
                out.extend([1.0 if i < n_act else 0.0
                            for i in range(_MAX_PATCHES)])
            elif name == "flip":
                out.append(random.random())
                out.append(random.random())
        return np.asarray(out, np.float32)

    def __call__(self, inputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        arrays = {k: jnp.asarray(v) for k, v in inputs.items()
                  if isinstance(v, np.ndarray) and v.ndim == 4}
        passthrough = {k: v for k, v in inputs.items() if k not in arrays}
        rnd = self._draw_randoms(arrays)
        self._seed += 1
        out = self._fn(arrays, jnp.asarray(rnd), np.uint32(self._seed))
        result = {k: np.asarray(v.astype(self.out_dtype)
                                if self.out_dtype is not None
                                and k == "images" else v)
                  for k, v in out.items()}
        result.update(passthrough)
        return result
