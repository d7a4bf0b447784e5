"""Alpha-CLIP vision/text transformers with MaPLe deep prompting.

Re-design of `/root/reference/alpha_clip_rw/model.py` for TPU:

  * `VisionTransformer_MaPLe` (:507-563): RGB patch conv + 1-channel alpha
    patch conv summed, class token, learned positional embedding, 4 shallow
    VPT tokens appended at the END of the sequence, deep prompt replacement
    of those trailing tokens in layers 1..8 (prompt depth 9), fp32 layer
    norms, QuickGELU MLPs, final cls-token projection to the shared space.
  * text `Transformer` (:364-434): causal mask, deep prompt replacement of
    tokens [1 : 1+n_ctx] in layers 1..8, EOT-token pooling via argmax of the
    token ids, projection to the shared space.

TPU-first choices: batch-first (B, L, D) layouts (the reference permutes to
LND for torch's MHA; XLA prefers leading batch), one fused qkv projection,
fp32 softmax, static prompt splicing (pure slice+concat — no dynamic shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.norms import LayerNormFP32
from ...ops.flash_attention import flash_qkv_packed_plain
from ...ops.linear import (
    ln_linear_act_bt,
    ln_mlp_residual_bt,
    proj_rows,
)


@dataclasses.dataclass(frozen=True)
class AlphaClipConfig:
    # vision tower (ViT-L/14@336)
    image_resolution: int = 336
    vision_patch_size: int = 14
    vision_width: int = 1024
    vision_layers: int = 24
    vision_heads: int = 16
    embed_dim: int = 768  # shared image/text space
    # text tower
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 768
    transformer_heads: int = 12
    transformer_layers: int = 12
    # MaPLe
    n_ctx: int = 4          # learned prompt tokens
    prompt_depth: int = 9   # layers 0..8 carry prompts (8 deep replacements)
    # numerics
    dtype: jnp.dtype = jnp.float32
    # Pallas fused path (qkv/attention/proj/MLP kernels). False = pure XLA
    # formulation — the on-TPU reference for kernel equivalence checks.
    fused: bool = True

    @property
    def grid(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @classmethod
    def vit_l_14_336(cls, **overrides) -> "AlphaClipConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "AlphaClipConfig":
        # Real vocab/context so the production tokenizer + prompt bank
        # machinery runs unchanged; the towers themselves stay tiny.
        defaults = dict(
            image_resolution=28, vision_patch_size=14, vision_width=32,
            vision_layers=3, vision_heads=4, embed_dim=16,
            context_length=77, vocab_size=49408, transformer_width=24,
            transformer_heads=4, transformer_layers=3,
            n_ctx=2, prompt_depth=2,
        )
        defaults.update(overrides)
        return cls(**defaults)


def build_causal_mask(length: int) -> jnp.ndarray:
    """Additive causal mask (length, length): 0 on/below diag, -inf above."""
    mask = jnp.full((length, length), -jnp.inf, dtype=jnp.float32)
    return jnp.triu(mask, k=1)


class PallasClipProj(nn.Module):
    """Output projection consuming the attention kernel's d-major
    (B, 1, heads*d, S) output via `proj_rows` (param tree identical to
    nn.Dense); optional fused residual epilogue."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, res: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[2], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        b = bias.astype(self.dtype)[None]
        return proj_rows(x, kernel.astype(self.dtype), b, res)


class ClipAttention(nn.Module):
    """Fused-qkv multi-head attention (reference `Attention`, model.py:176-256).

    Fused mode (`ln` given): x is the block's RAW input — ln_1 folds into the
    qkv matmul prologue and `residual` into the projection epilogue."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        ln: Optional[tuple] = None,
        residual: Optional[jnp.ndarray] = None,
    ):
        B, L, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        # Fused TPU path (vision tower: no mask): Pallas qkv matmul -> packed
        # plain-softmax attention -> head-consuming projection; zero XLA
        # transposes/copies (same design as the SAM encoder, sam_encoder.py).
        if (
            attn_mask is None
            and ln is not None
            and jax.default_backend() != "cpu"
            and self.num_heads % 8 == 0
            and (8 * head_dim) % 128 == 0
        ):
            g1, be1 = ln
            wq, bq = _ParamsDense(self.dim, 3 * self.dim, name="in_proj")()
            qkv3d = ln_linear_act_bt(
                x, g1[None], be1[None],
                wq.astype(self.dtype), bq.astype(self.dtype)[None],
                eps=1e-5, activation=None,
            )
            out = flash_qkv_packed_plain(
                qkv3d, scale, self.num_heads, head_dim
            )  # (B, heads*hd, L) — d-major for proj_rows
            res4 = residual.reshape(B, 1, L, self.dim) if residual is not None else None
            y = PallasClipProj(self.dim, dtype=self.dtype, name="out_proj")(
                out.reshape(B, 1, self.dim, L), res4
            )
            return y.reshape(B, L, self.dim)
        assert ln is None, "fused ln requires the Pallas path (caller gates)"
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="in_proj")(x)
        qkv = qkv.reshape(B, L, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum(
            "bhqc,bhkc->bhqk", q * scale, k,
            preferred_element_type=jnp.float32,
        )
        if attn_mask is not None:
            logits = logits + attn_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", probs, v, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class ClipMLP(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="c_fc")(x)
        x = x * jax.nn.sigmoid(1.702 * x)  # QuickGELU (model.py:171-173)
        return nn.Dense(self.dim, dtype=self.dtype, name="c_proj")(x)


class _ParamsLN(nn.Module):
    """LayerNormFP32-compatible params without applying the norm
    (consumed by the fused MLP kernel)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32),
        )


class _ParamsDense(nn.Module):
    """nn.Dense-compatible params without applying the layer."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.in_dim, self.out_dim), jnp.float32,
            ),
            self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32),
        )


class _ParamsClipMLP(nn.Module):
    """ClipMLP-compatible param tree for the fused kernels."""

    dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _ParamsDense(self.dim, 4 * self.dim, name="c_fc")()
        w2, b2 = _ParamsDense(4 * self.dim, self.dim, name="c_proj")()
        return w1, b1, w2, b2


class ResidualBlock(nn.Module):
    """Pre-norm residual attention block shared by both towers."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = True

    @nn.compact
    def __call__(self, x, attn_mask: Optional[jnp.ndarray] = None):
        head_dim = self.dim // self.num_heads
        attn = ClipAttention(self.dim, self.num_heads, self.dtype, name="attn")
        if (
            self.fused
            and attn_mask is None
            and jax.default_backend() != "cpu"
            and self.num_heads % 8 == 0
            and (8 * head_dim) % 128 == 0
        ):
            # ln_1 folds into the qkv prologue and the residual into the
            # projection epilogue (same fusion as the SAM encoder blocks).
            g1, be1 = _ParamsLN(self.dim, name="ln_1")()
            x = attn(x, None, ln=(g1, be1), residual=x)
        else:
            x = x + attn(LayerNormFP32(eps=1e-5, name="ln_1")(x), attn_mask)
        if self.fused and jax.default_backend() != "cpu":
            # Whole MLP as ONE kernel (LN2 prologue, QuickGELU between the
            # matmuls, residual epilogue) — the 4*dim hidden stays in VMEM.
            g2, be2 = _ParamsLN(self.dim, name="ln_2")()
            w1, b1, w2, b2 = _ParamsClipMLP(self.dim, name="mlp")()
            # hidden_grid=4: the CLIP sequence (577+ctx, prime-ish) gives
            # only B programs per call — too few to overlap the LN/GELU VPU
            # stretches; walking the 4*dim hidden as 4 extra grid steps
            # recovers ~10% (scripts/probe_clipmlp.py)
            return ln_mlp_residual_bt(
                x, g2[None], be2[None],
                w1.astype(self.dtype), b1.astype(self.dtype)[None],
                w2.astype(self.dtype), b2.astype(self.dtype)[None],
                eps=1e-5, activation="quick_gelu",
                hidden_grid=4,
            )
        x = x + ClipMLP(self.dim, self.dtype, name="mlp")(
            LayerNormFP32(eps=1e-5, name="ln_2")(x)
        )
        return x


def _splice_visual_prompt(x: jnp.ndarray, prompt: jnp.ndarray, n_ctx: int) -> jnp.ndarray:
    """Replace the trailing n_ctx tokens with this layer's prompt (model.py:319-338)."""
    B = x.shape[0]
    ctx = jnp.broadcast_to(prompt[None].astype(x.dtype), (B, n_ctx, x.shape[-1]))
    return jnp.concatenate([x[:, : x.shape[1] - n_ctx, :], ctx], axis=1)


def _splice_text_prompt(x: jnp.ndarray, prompt: jnp.ndarray, n_ctx: int) -> jnp.ndarray:
    """Replace tokens [1 : 1+n_ctx] (after SOT) with this layer's prompt (model.py:341-355)."""
    B = x.shape[0]
    ctx = jnp.broadcast_to(prompt[None].astype(x.dtype), (B, n_ctx, x.shape[-1]))
    return jnp.concatenate([x[:, :1, :], ctx, x[:, 1 + n_ctx :, :]], axis=1)


class AlphaClipVisionTower(nn.Module):
    """MaPLe Alpha-CLIP vision transformer -> (B, embed_dim) image features."""

    cfg: AlphaClipConfig

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,            # (B, H, W, 3) normalised
        alpha: jnp.ndarray,            # (B, H, W, 1)
        shared_ctx: jnp.ndarray,       # (n_ctx, vision_width) projected prompt
        deep_prompts: Sequence[jnp.ndarray],  # prompt_depth-1 of (n_ctx, vision_width)
    ) -> jnp.ndarray:
        cfg = self.cfg
        width = cfg.vision_width
        p = cfg.vision_patch_size

        x = nn.Conv(
            width, (p, p), strides=(p, p), padding="VALID", use_bias=False,
            dtype=cfg.dtype, name="conv1",
        )(image.astype(cfg.dtype))
        x = x + nn.Conv(
            width, (p, p), strides=(p, p), padding="VALID", use_bias=False,
            dtype=cfg.dtype, name="conv1_alpha",
        )(alpha.astype(cfg.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, width)  # (B, grid^2, width)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(width ** -0.5), (width,), jnp.float32
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(width ** -0.5),
            (cfg.grid ** 2 + 1, width),
            jnp.float32,
        )
        cls = jnp.broadcast_to(
            class_embedding[None, None].astype(x.dtype), (B, 1, width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding[None].astype(x.dtype)

        # Shallow VPT: append the n_ctx learned tokens at the end.
        vctx = jnp.broadcast_to(
            shared_ctx[None].astype(x.dtype), (B, cfg.n_ctx, width)
        )
        x = jnp.concatenate([x, vctx], axis=1)
        x = LayerNormFP32(eps=1e-5, name="ln_pre")(x)

        for i in range(cfg.vision_layers):
            if i > 0 and (i - 1) < len(deep_prompts):
                x = _splice_visual_prompt(x, deep_prompts[i - 1], cfg.n_ctx)
            x = ResidualBlock(
                width, cfg.vision_heads, cfg.dtype, cfg.fused,
                name=f"resblock_{i}",
            )(x)

        x = LayerNormFP32(eps=1e-5, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            nn.initializers.normal(width ** -0.5),
            (width, cfg.embed_dim),
            jnp.float32,
        )
        return (x.astype(jnp.float32) @ proj).astype(jnp.float32)


class ClipTextTower(nn.Module):
    """MaPLe CLIP text transformer -> (N, embed_dim) text features.

    Takes pre-embedded prompts (the prompt learner splices learned ctx into
    the embedding stream before this module — `cocotrainers/mapleAlphaCLIP.py:64-78`).
    """

    cfg: AlphaClipConfig

    @nn.compact
    def __call__(
        self,
        prompt_embeddings: jnp.ndarray,   # (N, L, width) token embeddings
        eot_indices: jnp.ndarray,         # (N,) int — argmax of token ids
        deep_prompts: Sequence[jnp.ndarray],  # prompt_depth-1 of (n_ctx, width)
    ) -> jnp.ndarray:
        cfg = self.cfg
        width = cfg.transformer_width
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.context_length, width),
            jnp.float32,
        )
        x = prompt_embeddings.astype(cfg.dtype) + positional_embedding[None].astype(
            cfg.dtype
        )
        mask = build_causal_mask(cfg.context_length)
        for i in range(cfg.transformer_layers):
            if i > 0 and (i - 1) < len(deep_prompts):
                x = _splice_text_prompt(x, deep_prompts[i - 1], cfg.n_ctx)
            x = ResidualBlock(
                width, cfg.transformer_heads, cfg.dtype, cfg.fused,
                name=f"resblock_{i}",
            )(x, mask)
        x = LayerNormFP32(eps=1e-5, name="ln_final")(x)
        x = jnp.take_along_axis(x, eot_indices[:, None, None], axis=1)[:, 0, :]
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(width ** -0.5),
            (width, cfg.embed_dim),
            jnp.float32,
        )
        return (x.astype(jnp.float32) @ text_projection).astype(jnp.float32)
