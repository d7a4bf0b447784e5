"""Pallas flash attention for the SAM global blocks (4096 tokens).

Design: the rel-pos bias is folded into augmented q'/k' features
(ops/aug_attention.py), so this kernel is plain softmax attention — but with
*different* q/k and v head dims (d_qk is the augmented 256, d_v is 128).

At 4096 tokens the whole K'/V fit comfortably in VMEM (K' 4096x256 bf16 =
2 MB, V 4096x128 bf16 = 1 MB), so instead of online softmax over KV tiles we
tile ONLY the query dimension and compute each row's softmax exactly in one
shot — simpler, exact, and the (block_q x seq) score tile (128x4096 fp32 =
2 MB) never touches HBM. This is the whole point vs the XLA path, which
materialises (B, heads, 4096, 4096) logits+probs in HBM (4.3 GB at batch 4).

Grid: (B*heads, seq/block_q) — both parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (block_q, d_qk)
    k = k_ref[0]  # (seq, d_qk)
    v = v_ref[0]  # (seq, d_v)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, seq)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o_ref[0] = jax.lax.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_attention_fullk(
    q_aug: jnp.ndarray,  # (B, N, d_qk) — pre-scaled, bias-augmented
    k_aug: jnp.ndarray,  # (B, N, d_qk)
    v: jnp.ndarray,      # (B, N, d_v)
    block_q: int = 128,
) -> jnp.ndarray:
    B, N, d_qk = q_aug.shape
    d_v = v.shape[-1]
    assert N % block_q == 0, (N, block_q)
    grid = (B, N // block_q)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, N, d_v), v.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d_qk), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, d_qk), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, d_v), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d_v), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * (d_qk + d_v),
            bytes_accessed=(q_aug.size + k_aug.size * (N // block_q) + v.size) * 2,
            transcendentals=B * N * N,
        ),
    )(q_aug, k_aug, v)
