"""Edge-aware SAM mask decoder.

Re-design of `/root/reference/models/mmseg/models/sam/mask_decoder_edge.py`
(MaskDecoder :16-190). Differences from stock SAM:

  * 6 output tokens: iou + 4 mask tokens + 1 edge token;
  * prompt tokens are NOT concatenated into the query stream — the CLIP
    sparse embeddings enter as the `cond` stream of the two-way transformer
    (`mask_decoder_edge.py:152-154`);
  * `embedding_encoder` upsamples image embeddings 4x into edge features,
    `embedding_maskfeature` refines the upscaled mask features, and the final
    mask is fused as `masks * sigmoid(edge) + masks` (`:181-186`);
  * `interm_embeddings` is accepted and ignored, faithfully reproducing the
    reference's dead argument (`:99` — its `compress_vit_feat` is commented
    out).

TPU notes: ConvTranspose 2x2/stride-2 upscaling is an MXU-friendly
depth-to-space matmul under XLA; everything is NHWC; the hypernetwork mask
product is one einsum over (tokens, channels) x (channels, pixels).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import LayerNormFP32
from .two_way_transformer import TwoWayTransformer, TwoWayTransformerConfig


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    transformer: TwoWayTransformerConfig = dataclasses.field(
        default_factory=TwoWayTransformerConfig
    )
    dtype: jnp.dtype = jnp.float32

    @property
    def num_mask_tokens(self) -> int:  # 4 mask + 1 edge
        return self.num_multimask_outputs + 1 + 1


class HyperMLP(nn.Module):
    """3-layer ReLU MLP (reference `MLP`, `mask_decoder_edge.py:195-217`)."""

    hidden: int
    out: int
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name=f"layer_{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, name=f"layer_{self.num_layers - 1}")(x)


class EdgeMaskDecoder(nn.Module):
    cfg: MaskDecoderConfig

    @nn.compact
    def __call__(
        self,
        image_embeddings: jnp.ndarray,       # (B, h, w, C) NHWC
        image_pe: jnp.ndarray,               # (h, w, C)
        sparse_prompt_embeddings: jnp.ndarray,  # (B, S, C) — cond stream
        dense_prompt_embeddings: jnp.ndarray,   # (B, h, w, C)
        multimask_output: bool = False,
        interm_embeddings: Optional[List[jnp.ndarray]] = None,  # accepted, unused
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        C = cfg.transformer_dim
        B, h, w, _ = image_embeddings.shape
        n_tokens = 1 + cfg.num_mask_tokens  # iou + 4 mask + edge

        # Deep edge features from raw image embeddings (4x upsample).
        e = nn.ConvTranspose(
            C // 4, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=cfg.dtype, name="edge_encoder_conv1"
        )(image_embeddings)
        e = LayerNormFP32(eps=1e-6, name="edge_encoder_ln")(e)
        e = jax.nn.gelu(e, approximate=False)
        edge_embeddings = nn.ConvTranspose(
            C // 8, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=cfg.dtype, name="edge_encoder_conv2"
        )(e)

        iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, C), jnp.float32
        )
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0),
            (cfg.num_mask_tokens - 1, C), jnp.float32,
        )
        edge_token = self.param(
            "edge_token", nn.initializers.normal(1.0), (1, C), jnp.float32
        )
        output_tokens = jnp.concatenate([iou_token, mask_tokens, edge_token], axis=0)
        tokens = jnp.broadcast_to(
            output_tokens[None].astype(cfg.dtype), (B, n_tokens, C)
        )

        src = image_embeddings + dense_prompt_embeddings
        src_flat = src.reshape(B, h * w, C)
        pe_flat = jnp.broadcast_to(
            image_pe.reshape(1, h * w, C).astype(cfg.dtype), (B, h * w, C)
        )

        hs, src_out = TwoWayTransformer(cfg.transformer, name="transformer")(
            src_flat, pe_flat, tokens, sparse_prompt_embeddings
        )
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1 : 1 + cfg.num_mask_tokens, :]

        # Upscale transformer-refined image embeddings 4x.
        src_img = src_out.reshape(B, h, w, C)
        upscaled = nn.ConvTranspose(
            C // 4, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=cfg.dtype, name="upscale_conv1"
        )(src_img)
        upscaled = LayerNormFP32(eps=1e-6, name="upscale_ln")(upscaled)
        upscaled = jax.nn.gelu(upscaled, approximate=False)
        upscaled = nn.ConvTranspose(
            C // 8, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=cfg.dtype, name="upscale_conv2"
        )(upscaled)
        upscaled = jax.nn.gelu(upscaled, approximate=False)

        # Edge feature refinement (3x3 "ConvTranspose" with stride 1 == conv).
        f = nn.ConvTranspose(
            C // 4, (3, 3), strides=(1, 1), padding="SAME", transpose_kernel=True,
            dtype=cfg.dtype, name="maskfeature_conv1",
        )(upscaled)
        f = LayerNormFP32(eps=1e-6, name="maskfeature_ln")(f)
        f = jax.nn.gelu(f, approximate=False)
        f = nn.ConvTranspose(
            C // 8, (3, 3), strides=(1, 1), padding="SAME", transpose_kernel=True,
            dtype=cfg.dtype, name="maskfeature_conv2",
        )(f)
        edge_feat = f + edge_embeddings

        # Hypernetwork heads: 5 per-token MLPs (4 mask + 1 edge).
        hyper_in = []
        for i in range(cfg.num_mask_tokens - 1):
            hyper_in.append(
                HyperMLP(C, C // 8, dtype=cfg.dtype, name=f"hyper_mlp_{i}")(
                    mask_tokens_out[:, i, :]
                )
            )
        hyper_edge = HyperMLP(C, C // 8, dtype=cfg.dtype, name="edge_mlp")(
            mask_tokens_out[:, cfg.num_mask_tokens - 1, :]
        )
        hyper_masks = jnp.stack(hyper_in, axis=1)  # (B, 4, C/8)

        masks = jnp.einsum(
            "btc,bhwc->bthw", hyper_masks, upscaled, preferred_element_type=jnp.float32
        )
        edge = jnp.einsum(
            "bc,bhwc->bhw", hyper_edge, edge_feat, preferred_element_type=jnp.float32
        )[:, None]  # (B, 1, H4, W4)

        edge = jax.nn.sigmoid(edge)
        masks = masks * edge + masks  # edge-gated fusion (fp32)

        # The reference builds the IoU head before adding the edge token, so
        # it predicts only the 4 mask qualities (`mask_decoder_edge.py:67-74`).
        iou_pred = HyperMLP(
            cfg.iou_head_hidden_dim,
            cfg.num_mask_tokens - 1,
            num_layers=cfg.iou_head_depth,
            dtype=cfg.dtype,
            name="iou_prediction_head",
        )(iou_token_out)

        if multimask_output:
            masks = masks[:, 1:, :, :]
            iou_pred = iou_pred[:, 1:]
        else:
            masks = masks[:, 0:1, :, :]
            iou_pred = iou_pred[:, 0:1]

        # (B, n, H4, W4) logits fp32; edge (B, 1, H4, W4) in [0, 1].
        return masks, edge, iou_pred
