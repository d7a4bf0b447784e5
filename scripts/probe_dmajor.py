"""Probe: d-major (transposed) attention output layout + packed-row proj.

Current production layout: attention kernels emit head-leading
(B, heads, T, S, d=80); the 80-lane minor physically pads to 128 in HBM
(+60% write/read bytes) and `proj_from_heads` runs at ~114 TF/s on the
padded reads (PERF.md "Remaining headroom").

Candidate: emit (B, T, heads*d, S) — each head stores its o^T (d, S) tile at
sublane offset h*d (80 = 10 sublane tiles, aligned), computed directly as
dot(v^T, p^T) with NO in-kernel transpose; proj consumes the packed rows as
one (heads*d, S)^T x (heads*d, C) matmul at full MXU rate.

Measures, at ViT-H windowed shapes (B=8, 16 full windows, 196 tokens):
  1. correctness of the transposed-store kernel vs the current one;
  2. attention+proj wall time, current vs d-major.

Usage: python scripts/probe_dmajor.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from camouflaged_vlm_tpu.ops import flash_attention as fa
from camouflaged_vlm_tpu.ops import linear as lin


def _win_dmajor_kernel(scale, head_group, d, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    # Same math as _qkv_packed_windows_kernel (win_group=1) but the pv dot is
    # issued transposed — o^T = v^T @ p^T — and stored at sublane offset h*d.
    sel = sel_ref[:]
    scores = []
    for h in range(head_group):
        q = q_ref[0, 0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0, 0][:, h * d : (h + 1) * d]
        rel = rel_ref[0, 0][:, h * 32 : (h + 1) * 32]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s += jax.lax.dot(rel, sel, preferred_element_type=jnp.float32)
        scores.append(s)
    for h in range(head_group):
        v = v_ref[0, 0][:, h * d : (h + 1) * d]  # (S, d)
        s = scores[h]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        # o^T (d, S): contract the key dim of v (axis 0) with p (axis 1)
        ot = jax.lax.dot_general(
            v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, 0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def win_attention_dmajor(qkv, rel, sel32, scale, heads, d, head_group=8):
    """(B, nwin, S, 3*heads*d) -> (B, nwin, heads*d, S) d-major output."""
    B, nwin, S, _ = qkv.shape
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_win_dmajor_kernel, scale, head_group, d)
    blk = lambda role: (lambda b, w, g: (b, w, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, nwin, heads * d, S), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nwin, n_hg),
            in_specs=[
                pl.BlockSpec((1, 1, S, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, head_group * 32),
                             lambda b, w, g: (b, w, 0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, S), lambda b, w, g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, gd, S), lambda b, w, g: (b, w, g, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(qkv, qkv, qkv, rel, sel32)


def _proj_rows_kernel(x_ref, w_ref, b_ref, r_ref, o_ref):
    # x (1, 1, K, S) d-major; out (1, 1, S, C) row-major + residual
    acc = jax.lax.dot_general(
        x_ref[0, 0], w_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, C)
    acc += b_ref[:].astype(jnp.float32) + r_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = acc.astype(o_ref.dtype)


def proj_dmajor(x, w, b, res):
    """x (B, n, heads*d, S) -> (B, n, S, C) = x^T @ w + b + res."""
    B, n, K, S = x.shape
    C = w.shape[1]
    return pl.pallas_call(
        _proj_rows_kernel,
        out_shape=jax.ShapeDtypeStruct((B, n, S, C), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n),
            in_specs=[
                pl.BlockSpec((1, 1, K, S), lambda b_, t: (b_, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, C), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b_, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, S, C), lambda b_, t: (b_, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, S, C), lambda b_, t: (b_, t, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * S * K * C,
            bytes_accessed=(x.size + 2 * B * n * S * C) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, w, b, res)


def bench(fn, args, iters=20, warmup=3, name=""):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms/iter")
    return dt


def main():
    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    B, nwin, S, heads, d, C = 8, 16, 196, 16, 80, 1280
    scale = d ** -0.5
    qkv = jnp.asarray(rng.standard_normal((B, nwin, S, 3 * heads * d)) * 0.2, dt)
    rel = jnp.asarray(rng.standard_normal((B, nwin, S, heads * 32)) * 0.1, dt)
    sel32 = jnp.pad(fa.make_rel_scatter(14, 14), ((0, 4), (0, 0)))
    w = jnp.asarray(rng.standard_normal((heads * d, C)) * 0.02, dt)
    b = jnp.asarray(rng.standard_normal((1, C)) * 0.1, dt)
    res = jnp.asarray(rng.standard_normal((B, nwin, S, C)) * 0.5, dt)

    # correctness: d-major pipeline vs current pipeline
    cur = jax.jit(
        lambda qkv, rel: lin.proj_from_heads_res(
            fa.flash_qkv_packed_windows(qkv, rel, sel32, scale, heads, d),
            w.reshape(heads, d, C), b, res,
        )
    )
    new = jax.jit(
        lambda qkv, rel: proj_dmajor(
            win_attention_dmajor(qkv, rel, sel32, scale, heads, d), w, b, res
        )
    )
    a = np.asarray(cur(qkv, rel), np.float64)
    bb = np.asarray(new(qkv, rel), np.float64)
    err = float((np.abs(a - bb) / np.maximum(np.abs(a), 1e-2)).mean())
    print(f"d-major correctness err={err:.2e} {'PASS' if err < 1e-4 else 'FAIL'}")

    bench(cur, (qkv, rel), name="current attn(5D)+proj_from_heads")
    bench(new, (qkv, rel), name="d-major attn+packed-row proj")

    # attention alone
    bench(
        jax.jit(lambda qkv, rel: fa.flash_qkv_packed_windows(qkv, rel, sel32, scale, heads, d)),
        (qkv, rel), name="attn current (5D out)",
    )
    bench(
        jax.jit(lambda qkv, rel: win_attention_dmajor(qkv, rel, sel32, scale, heads, d)),
        (qkv, rel), name="attn d-major out",
    )


if __name__ == "__main__":
    main()
