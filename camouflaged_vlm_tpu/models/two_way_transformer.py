"""Two-way transformer with CLIP-conditioned cross-attention.

Re-design of `/root/reference/models/mmseg/models/sam/transformer_maskdecoder_edge.py`
(TwoWayTransformer :16-109, TwoWayAttentionBlock :112-214, Attention :217-272).

Each block runs six steps per layer:
  1. token self-attention
  2. token -> image cross-attention
  3. token -> cond (CLIP sparse embeddings) cross-attention
  4. token MLP
  5. image -> cond cross-attention   (queries are image keys!)
  6. image -> token cross-attention

Sequence lengths are tiny (6 tokens, 4096 image, 2 cond), so plain XLA
attention is optimal; the point of care is layout: image tokens stay (B, N, C)
throughout so the surrounding convs/matmuls fuse.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.norms import LayerNormFP32


@dataclasses.dataclass(frozen=True)
class TwoWayTransformerConfig:
    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: jnp.dtype = jnp.float32


class ProjectedAttention(nn.Module):
    """Attention with separate q/k/v projections and optional down-projection.

    Mirrors the reference's decoder `Attention` (`transformer_maskdecoder_edge.py:217-272`):
    internal dim = embedding_dim // downsample_rate; softmax in fp32.
    """

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        head_dim = internal // self.num_heads
        qp = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        logits = jnp.einsum(
            "bhqc,bhkc->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / (head_dim ** 0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", probs, vh, preferred_element_type=jnp.float32)
        out = out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="lin1")(x)
        x = nn.relu(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="lin2")(x)


class TwoWayAttentionBlock(nn.Module):
    cfg: TwoWayTransformerConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe, cond_embedding, cond_pe):
        cfg = self.cfg
        attn = lambda name, ds: ProjectedAttention(
            embedding_dim=cfg.embedding_dim,
            num_heads=cfg.num_heads,
            downsample_rate=ds,
            dtype=cfg.dtype,
            name=name,
        )

        # 1. token self-attention
        if self.skip_first_layer_pe:
            queries = attn("self_attn", 1)(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + attn("self_attn", 1)(q, q, queries)
        queries = LayerNormFP32(eps=1e-5, name="norm1")(queries)

        # 2. token -> image
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + attn("cross_attn_token_to_image", cfg.attention_downsample_rate)(q, k, keys)
        queries = LayerNormFP32(eps=1e-5, name="norm2")(queries)

        # 3. token -> cond
        q = queries + query_pe
        k = cond_embedding + cond_pe
        queries = queries + attn("cross_attn_token_to_cond", cfg.attention_downsample_rate)(q, k, cond_embedding)
        queries = LayerNormFP32(eps=1e-5, name="norm2_cond")(queries)

        # 4. token MLP
        queries = queries + MLP(cfg.embedding_dim, cfg.mlp_dim, cfg.dtype, name="mlp")(queries)
        queries = LayerNormFP32(eps=1e-5, name="norm3")(queries)

        # 5. image -> cond (queries are the image tokens)
        q = cond_embedding + cond_pe
        k = keys + key_pe
        keys = keys + attn("cross_attn_image_to_cond", cfg.attention_downsample_rate)(k, q, cond_embedding)
        keys = LayerNormFP32(eps=1e-5, name="norm4_cond")(keys)

        # 6. image -> token
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + attn("cross_attn_image_to_token", cfg.attention_downsample_rate)(k, q, queries)
        keys = LayerNormFP32(eps=1e-5, name="norm4")(keys)

        return queries, keys


class TwoWayTransformer(nn.Module):
    cfg: TwoWayTransformerConfig

    @nn.compact
    def __call__(
        self,
        image_embedding: jnp.ndarray,  # (B, N, C) — already flattened NHWC
        image_pe: jnp.ndarray,         # (B, N, C)
        point_embedding: jnp.ndarray,  # (B, T, C)
        cond_embedding: jnp.ndarray,   # (B, S, C)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        queries, keys = point_embedding, image_embedding
        for i in range(cfg.depth):
            queries, keys = TwoWayAttentionBlock(
                cfg, skip_first_layer_pe=(i == 0), name=f"layer_{i}"
            )(
                queries, keys,
                query_pe=point_embedding, key_pe=image_pe,
                cond_embedding=cond_embedding, cond_pe=cond_embedding,
            )
        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + ProjectedAttention(
            embedding_dim=cfg.embedding_dim,
            num_heads=cfg.num_heads,
            downsample_rate=cfg.attention_downsample_rate,
            dtype=cfg.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = LayerNormFP32(eps=1e-5, name="norm_final_attn")(queries)
        return queries, keys
