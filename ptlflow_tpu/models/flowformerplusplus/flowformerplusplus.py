"""FlowFormer++: masked-cost-volume-pretrained FlowFormer (PerCostFormer3).

Parity with /root/reference/ptlflow/models/flowformerplusplus/
(flowformerplusplus.py:14-339, FlowFormer/PerCostFormer3/encoder.py
MemoryEncoder :580-755 / CostPerceiverEncoder :259-573, decoder.py
MemoryDecoder :188-470, gru.py GMAUpdateBlock :332-363).

With the released checkpoints' default configuration (cross_attn="all",
vertical_encoder_attn="twins", gma="GMA", use_patch=False, r_16=-1,
pretrain_mode=False) the fine-tuned FlowFormer++ architecture matches
FlowFormer except for two deltas, both implemented here:
- the decoder cross-attention projects the attention output alone
  (Linear(v_dim) -> dim, decoder.py:62,126-131) instead of FlowFormer's
  Linear(v_dim*2) over [x, shortcut];
- the memory encoder has no channel convertor (use_convertor=False) and the
  default decoder depth is 32.
The pretraining-only machinery (cost-volume masking, pretrain heads) is
training infrastructure for the MCVA phase and is not part of the released
flow checkpoints' forward path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model
from ..base import BaseModel
from ..flowformer.flowformer import (CostPerceiverEncoder,
                                     CrossAttentionLayerDec, GMAUpdateBlock,
                                     compute_grid_indices, compute_weight,
                                     linear_position_embedding_sine, _mha)
from ..flowformer.twins_tpu import twins_svt_large
from ..gma.gma_utils import Attention


class CrossAttentionLayerDecPP(CrossAttentionLayerDec):
    """FF++ decoder cross-attention: proj(x) without the shortcut concat
    (flowformerplusplus decoder.py:62,126-131)."""

    def __init__(self, qk_dim, v_dim, query_token_dim, tgt_token_dim,
                 add_flow_token=True, num_heads=8, dropout=0.0):
        super().__init__(qk_dim, v_dim, query_token_dim, tgt_token_dim,
                         add_flow_token=add_flow_token, num_heads=num_heads,
                         dropout=dropout)
        self.proj = nn.Linear(v_dim, query_token_dim)

    def __call__(self, params, query, key, value, query_coord, **kw):
        b, h1, w1, _ = query_coord.shape
        qc = query_coord.reshape(b * h1 * w1, 1, 2)
        qc_enc = linear_position_embedding_sine(qc, dim=self.dim)
        short_cut = query
        query = self.norm1(params["norm1"], query)
        if self.add_flow_token:
            q = self.q(params["q"], query + qc_enc)
        else:
            q = self.q(params["q"], qc_enc)
        x = _mha(q, key, value, self.num_heads, self.scale)
        x = self.proj(params["proj"], x)
        x = short_cut + x
        return x + self.ffn(params["ffn"], self.norm2(params["norm2"], x))


class MemoryEncoderPP(nn.Module):
    """FF++ memory encoder (encoder.py:580-755): twins features + cost
    perceiver, no channel convertor."""

    def __init__(self, cost_heads_num, **cfg):
        super().__init__()
        self.cost_heads_num = cost_heads_num
        self.feat_encoder = twins_svt_large()
        self.cost_perceiver_encoder = CostPerceiverEncoder(
            cost_heads_num=cost_heads_num, **cfg)

    def corr(self, fmap1, fmap2):
        b, h, w, c = fmap1.shape
        heads = self.cost_heads_num
        d = c // heads
        f1 = fmap1.reshape(b, h * w, heads, d).transpose(0, 2, 1, 3)
        f2 = fmap2.reshape(b, h * w, heads, d).transpose(0, 2, 1, 3)
        corr = jnp.einsum("bhid,bhjd->bhij", f1, f2,
                          preferred_element_type=jnp.float32)
        return corr.reshape(b, heads, h, w, h, w).astype(fmap1.dtype)

    def __call__(self, params, img1, img2, data, context, **kw):
        imgs = jnp.concatenate([img1, img2], axis=0)
        feats = self.feat_encoder(params["feat_encoder"], imgs)
        feat_s, feat_t = jnp.split(feats, 2, axis=0)
        cost_volume = self.corr(feat_s, feat_t)
        return self.cost_perceiver_encoder(
            params["cost_perceiver_encoder"], cost_volume, data, context)


class MemoryDecoderPP(nn.Module):
    """FF++ memory decoder (decoder.py:188-470, default GMA path)."""

    def __init__(self, query_latent_dim, cost_heads_num, decoder_depth,
                 patch_size, cost_latent_dim, encoder_latent_dim, dropout,
                 gt_r: int = 15):
        super().__init__()
        self.dim = query_latent_dim
        self.depth = decoder_depth
        self.flow_token_encoder = nn.Sequential(
            nn.Conv2d(81 * cost_heads_num, query_latent_dim, 1, 1), nn.gelu,
            nn.Conv2d(query_latent_dim, query_latent_dim, 1, 1))
        # the MCVA pretraining head remains in the released checkpoints;
        # with the default gt_r=15 it regresses gt_r^2 cost bins
        # (decoder.py:248-256)
        d = query_latent_dim
        self.pretrain_head = nn.Sequential(
            nn.Conv2d(d, d * 2, 1, 1), nn.gelu,
            nn.Conv2d(d * 2, d * 2, 1, 1), nn.gelu,
            nn.Conv2d(d * 2, gt_r ** 2 if gt_r > 0 else 81, 1, 1))
        self.proj = nn.Conv2d(encoder_latent_dim, 256, 1)
        self.decoder_layer_cross_attend = CrossAttentionLayerDecPP(
            query_latent_dim, query_latent_dim, query_latent_dim,
            cost_latent_dim, add_flow_token=True, dropout=dropout)
        self.update_block = GMAUpdateBlock(only_global=False,
                                           query_latent_dim=query_latent_dim,
                                           hidden_dim=128)
        self.att = Attention(dim=128, heads=1, max_pos_size=160,
                             dim_head=128)

    def from_torch(self, flat, strict=True, _path=""):
        remapped = {}
        pref = "decoder_layer.cross_attend."
        for k, v in flat.items():
            if k.startswith(pref):
                remapped["decoder_layer_cross_attend." + k[len(pref):]] = v
            else:
                remapped[k] = v
        return super().from_torch(remapped, strict=strict, _path=_path)

    def encode_flow_token(self, cost_maps, coords):
        from ...ops.correlation import corr_pyramid_lookup

        return corr_pyramid_lookup([cost_maps], coords, radius=4)

    def __call__(self, params, cost_memory, context, data, prev_flow=None,
                 training=False):
        cost_maps = data["cost_maps"]
        b, h1, w1, _ = context.shape
        coords0 = coords_grid(b, h1, w1, dtype=context.dtype)
        coords1 = coords0
        if prev_flow is not None:
            coords1 = coords1 + forward_interpolate(prev_flow)

        context = self.proj(params["proj"], context)
        net = jnp.tanh(context[..., :128])
        inp = nn.relu(context[..., 128:])
        attention = self.att(params["att"], inp)

        ca = params["decoder_layer_cross_attend"]
        key = self.decoder_layer_cross_attend.k(ca["k"], cost_memory)
        value = self.decoder_layer_cross_attend.v(ca["v"], cost_memory)
        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            cost_forward = self.encode_flow_token(cost_maps, coords1)
            query = self.flow_token_encoder(params["flow_token_encoder"],
                                            cost_forward)
            query = query.reshape(b * h1 * w1, 1, self.dim)
            cost_global = self.decoder_layer_cross_attend(
                ca, query, key, value, coords1)
            cost_global = cost_global.reshape(b, h1, w1, self.dim)
            corr = jnp.concatenate([cost_global, cost_forward], axis=-1)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow, attention)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        mask0 = jnp.zeros((b, h1, w1, 64 * 9), context.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.depth)

        if training:
            flows_lr, masks = ys
            it = flows_lr.shape[0]
            ups = convex_upsample(
                flows_lr.reshape(it * b, h1, w1, 2),
                masks.reshape(it * b, h1, w1, masks.shape[-1]))
            flow_predictions = ups.reshape(it, b, 8 * h1, 8 * w1, 2)
        else:
            flow_predictions = convex_upsample(
                coords1 - coords0, last_mask)[None]
        return flow_predictions, coords1 - coords0


class FlowFormerPlusPlus(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformerplusplus-chairs-a7745dd5.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformerplusplus-things-4db3ecff.ckpt",
        "things288960": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformerplusplus-things_288960-a4291d41.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformerplusplus-sintel-d14a1968.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowformerplusplus-kitti-65b828c3.ckpt",
    }

    def __init__(self, cnet: str = "twins", fnet: str = "twins",
                 patch_size: int = 8, cost_heads_num: int = 1,
                 cost_latent_input_dim: int = 64,
                 cost_latent_token_num: int = 8, cost_latent_dim: int = 128,
                 pe: str = "linear", encoder_depth: int = 3,
                 encoder_latent_dim: int = 256, decoder_depth: int = 32,
                 dropout: float = 0.0, vert_c_dim: int = 64,
                 query_latent_dim: int = 64, cost_encoder_res: bool = True,
                 use_tile_input: bool = True, tile_height: int = 432,
                 tile_sigma: float = 0.05,
                 train_size: Optional[Tuple[int, int]] = None, **kwargs):
        super().__init__(output_stride=32, loss_fn=None, **kwargs)
        assert cnet == "twins" and fnet == "twins"
        self.use_tile_input = use_tile_input
        self.tile_height = tile_height
        self.tile_sigma = tile_sigma
        self.train_size = train_size

        self.memory_encoder = MemoryEncoderPP(
            cost_heads_num=cost_heads_num, patch_size=patch_size,
            cost_latent_input_dim=cost_latent_input_dim, pe=pe,
            encoder_depth=encoder_depth, cost_latent_dim=cost_latent_dim,
            dropout=dropout, vert_c_dim=vert_c_dim,
            cost_latent_token_num=cost_latent_token_num,
            cost_encoder_res=cost_encoder_res)
        self.memory_decoder = MemoryDecoderPP(
            query_latent_dim=query_latent_dim,
            cost_heads_num=cost_heads_num, decoder_depth=decoder_depth,
            patch_size=patch_size, cost_latent_dim=cost_latent_dim,
            encoder_latent_dim=encoder_latent_dim, dropout=dropout)
        self.context_encoder = twins_svt_large()

    def _predict(self, params, image1, image2, prev_flow=None,
                 training=False):
        data = {}
        context = self.context_encoder(params["context_encoder"], image1)
        cost_memory = self.memory_encoder(params["memory_encoder"], image1,
                                          image2, data, context)
        return self.memory_decoder(params["memory_decoder"], cost_memory,
                                   context, data, prev_flow=prev_flow,
                                   training=training)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        if self.use_tile_input and self.train_size is not None \
                and not training:
            return self.forward_tile(params, inputs)
        return self.forward_pad(params, inputs, training)

    def forward_pad(self, params, inputs, training=False):
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        prev_flow = None
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            prev_flow = prev["flow_small"]
            if prev_flow.ndim == 4 and prev_flow.shape[-1] != 2:
                prev_flow = jnp.moveaxis(prev_flow, -3, -1)
        flow_predictions, flow_small = self._predict(
            params, images[:, 0], images[:, 1], prev_flow,
            training=training)
        flow_predictions = self.postprocess_predictions(
            flow_predictions, image_resizer, is_flow=True)
        out = {"flows": self.nhwc_flow_to_output(flow_predictions[-1])}
        if training:
            out["flow_preds"] = flow_predictions
        else:
            out["flow_small"] = jnp.moveaxis(flow_small, -1, -3)
        return out

    def forward_tile(self, params, inputs):
        """Tiled inference (flowformerplusplus.py:257-307)."""
        train_size = tuple(self.train_size)
        input_size = inputs["images"].shape[-2:]
        image_size = (max(self.tile_height, input_size[-2]), input_size[-1])
        hws = compute_grid_indices(image_size, train_size)
        weights_np = compute_weight(hws, image_size, train_size,
                                    self.tile_sigma)
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", target_size=image_size, pad_two_side=False,
            pad_mode="constant", pad_value=-1)
        image1 = images[:, 0]
        image2 = images[:, 1]
        flows = jnp.zeros(image1.shape[:1] + image_size + (2,), image1.dtype)
        flow_count = jnp.zeros((1,) + image_size + (1,), image1.dtype)
        for idx, (h, w) in enumerate(hws):
            t1 = image1[:, h:h + train_size[0], w:w + train_size[1]]
            t2 = image2[:, h:h + train_size[0], w:w + train_size[1]]
            preds, _ = self._predict(params, t1, t2)
            eh = min(h + train_size[0], image_size[0])
            ew = min(w + train_size[1], image_size[1])
            wt = jnp.asarray(weights_np[idx, h:eh, w:ew],
                             image1.dtype)[None, :, :, None]
            flows = flows.at[:, h:eh, w:ew].add(
                preds[-1][:, :eh - h, :ew - w] * wt)
            flow_count = flow_count.at[:, h:eh, w:ew].add(wt)
        output_flow = flows / flow_count
        output_flow = self.postprocess_predictions(output_flow,
                                                   image_resizer,
                                                   is_flow=True)
        return {"flows": self.nhwc_flow_to_output(output_flow)}


@register_model
class flowformer_pp(FlowFormerPlusPlus):
    pass
