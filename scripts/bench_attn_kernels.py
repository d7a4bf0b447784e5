"""Micro-bench attention-kernel variants at production shapes (batch 8).

Variants:
  * windowed packed, win_group in {1, 5, 25}
  * windowed packed with HEAD-PADDED lanes (d 80->128 per head, aligned slices)
  * global packed (d=80 slices) vs global head-padded (d=128 aligned slices)
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


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def head_padded_kernel(scale, head_group, dp, hw, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    sel = sel_ref[:]
    for h in range(head_group):
        q = q_ref[0][:, h * dp : (h + 1) * dp] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * dp : (h + 1) * dp]
        v = v_ref[0][:, h * dp : (h + 1) * dp]
        rel = rel_ref[0][:, h * hw : (h + 1) * hw]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s += jax.lax.dot(rel, sel, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = (p / l).astype(v.dtype)
        o_ref[0, h] = jax.lax.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def global_head_padded(qkv_p, rel, sel, scale, heads, dp, block_q=512, head_group=8):
    B, N, _ = qkv_p.shape
    hw = sel.shape[0]
    n_hg = heads // head_group
    gd = head_group * dp
    kernel = functools.partial(head_padded_kernel, scale, head_group, dp, hw)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, heads, N, dp), qkv_p.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, n_hg + g), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 2 * n_hg + g), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, head_group * hw), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((hw, N), lambda b, g, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, head_group, block_q, dp), lambda b, g, i: (b, g, i, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv_p, qkv_p, qkv_p, rel, sel)


def win_head_padded(qkv_p, rel, sel32, scale, heads, dp, head_group=8, win_group=5):
    B, nwin, Nw, _ = qkv_p.shape
    n_hg = heads // head_group
    gd = head_group * dp

    def kern(scale, head_group, dp, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
        sel = sel_ref[:]
        for h in range(head_group):
            q = q_ref[0][:, :, h * dp : (h + 1) * dp] * jnp.asarray(scale, q_ref.dtype)
            k = k_ref[0][:, :, h * dp : (h + 1) * dp]
            v = v_ref[0][:, :, h * dp : (h + 1) * dp]
            rel = rel_ref[0][:, :, h * 32 : (h + 1) * 32]
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            s += jax.lax.dot_general(rel, sel, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(v.dtype)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            o_ref[0, h] = o.astype(o_ref.dtype)

    kernel = functools.partial(kern, scale, head_group, dp)
    blk = lambda role: (lambda b, w, g: (b, w, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, heads, nwin, Nw, dp), qkv_p.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nwin // win_group, n_hg),
            in_specs=[
                pl.BlockSpec((1, win_group, Nw, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, head_group * 32), lambda b, w, g: (b, w, 0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, Nw), lambda b, w, g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, head_group, win_group, Nw, dp), lambda b, w, g: (b, g, w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv_p, qkv_p, qkv_p, rel, sel32)



def win_staged(qkv, rel, sel32, scale, heads, d, head_group=8, win_group=5):
    """Variant: ALL head score-dots issued first, then softmax+pv per head —
    exposes MXU(dot)/VPU(softmax) overlap to the Mosaic scheduler."""
    B, nwin, Nw, _ = qkv.shape
    n_hg = heads // head_group
    gd = head_group * d

    def kern(scale, head_group, d, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
        sel = sel_ref[:]
        ss = []
        for h in range(head_group):
            q = q_ref[0][:, :, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
            k = k_ref[0][:, :, h * d : (h + 1) * d]
            rel = rel_ref[0][:, :, h * 32 : (h + 1) * 32]
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            s += jax.lax.dot_general(rel, sel, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            ss.append(s)
        for h in range(head_group):
            v = v_ref[0][:, :, h * d : (h + 1) * d]
            s = ss[h]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(v.dtype)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            o_ref[0, h] = o.astype(o_ref.dtype)

    kernel = functools.partial(kern, scale, head_group, d)
    blk = lambda role: (lambda b, w, g: (b, w, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, heads, nwin, Nw, d), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, nwin // win_group, n_hg),
            in_specs=[
                pl.BlockSpec((1, win_group, Nw, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win_group, Nw, head_group * 32), lambda b, w, g: (b, w, 0, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, Nw), lambda b, w, g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, head_group, win_group, Nw, d), lambda b, w, g: (b, g, w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, qkv, qkv, rel, sel32)


def main():
    rng = np.random.default_rng(0)
    B, heads, d = 8, 16, 80
    scale = d ** -0.5

    # ---- windowed shapes
    nwin, Nw = 25, 196
    qkv = jnp.asarray(rng.standard_normal((B, nwin, Nw, 3 * heads * d)) * 0.1, jnp.bfloat16)
    rel = jnp.asarray(rng.standard_normal((B, nwin, Nw, heads * 32)) * 0.1, jnp.bfloat16)
    sel32 = jnp.pad(fa.make_rel_scatter(14, 14), ((0, 4), (0, 0)))
    for wg in (1, 5, 25):
        f = jax.jit(lambda q, r: fa.flash_qkv_packed_windows(q, r, sel32, scale, heads, d, win_group=wg))
        try:
            ms = timeit(f, qkv, rel)
            print(f"windowed packed wg={wg:2d}: {ms:7.3f} ms  ({5.9*8/ms:.0f} TF/s true)")
        except Exception as e:
            print(f"windowed packed wg={wg}: FAILED {str(e)[:120]}")

    dp = 128
    qkv_p = jnp.asarray(rng.standard_normal((B, nwin, Nw, 3 * heads * dp)) * 0.1, jnp.bfloat16)
    for wg in (5, 25):
        f = jax.jit(lambda q, r: win_head_padded(q, r, sel32, scale, heads, dp, win_group=wg))
        try:
            ms = timeit(f, qkv_p, rel)
            print(f"windowed HEAD-PAD wg={wg:2d}: {ms:7.3f} ms")
        except Exception as e:
            print(f"windowed HEAD-PAD wg={wg}: FAILED {str(e)[:120]}")

    for wg, hg in [(5, 8), (5, 4), (25, 2)]:
        f = jax.jit(lambda q, r, wg=wg, hg=hg: win_staged(q, r, sel32, scale, heads, d, head_group=hg, win_group=wg))
        try:
            ms = timeit(f, qkv, rel)
            print(f"windowed STAGED wg={wg:2d} hg={hg}: {ms:7.3f} ms")
        except Exception as e:
            print(f"windowed STAGED wg={wg} hg={hg}: FAILED {str(e)[:100]}")

    # ---- global shapes
    N = 4096
    hw = 128
    qkv_g = jnp.asarray(rng.standard_normal((B, N, 3 * heads * d)) * 0.1, jnp.bfloat16)
    rel_g = jnp.asarray(rng.standard_normal((N, B, heads, hw)) * 0.1, jnp.bfloat16)  # s-major (rel-v2)
    sel_g = fa.make_rel_scatter(64, 64)
    for bq, hg in [(512, 8), (1024, 8), (512, 4), (512, 16)]:
        f = jax.jit(lambda q, r, bq=bq, hg=hg: fa.flash_qkv_packed_global(
            q, r, sel_g, scale, heads, d, H=64, W=64, block_q=bq, head_group=hg))
        try:
            ms = timeit(f, qkv_g, rel_g)
            print(f"global packed bq={bq} hg={hg:2d}: {ms:7.3f} ms")
        except Exception as e:
            print(f"global packed bq={bq} hg={hg}: FAILED {str(e)[:100]}")




def bench_blockdiag_rel(rng):
    """Feasibility probe for next round's in-kernel rel: per-qh-group
    (14, 1280) @ (1280, 512) block-diagonal matmuls — what rate do
    small-M dense matmuls actually reach?"""
    import functools as ft

    K, N = 1280, 512
    x = jnp.asarray(rng.standard_normal((200, 196, K)) * 0.1, jnp.bfloat16)
    U = jnp.asarray(rng.standard_normal((14, K, N)) * 0.02, jnp.bfloat16)

    def kern(x_ref, u_ref, o_ref):
        for qh in range(14):
            rows = x_ref[0][qh * 14 : (qh + 1) * 14, :]   # (14, K)
            o = jax.lax.dot(rows, u_ref[qh], preferred_element_type=jnp.float32)
            o_ref[0, qh * 14 : (qh + 1) * 14, :] = o.astype(o_ref.dtype)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((200, 196, N), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            grid=(200,),
            in_specs=[
                pl.BlockSpec((1, 196, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((14, K, N), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 196, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )
    g = jax.jit(lambda x, U: f(x, U))
    try:
        ms = timeit(g, x, U)
        gf = 2 * 200 * 196 * K * N / 1e9
        print(f"blockdiag rel probe: {ms:7.3f} ms ({gf/ms:.0f} GF/ms = {gf/ms:.0f} TF/s-ish -> per-block cost estimate)")
    except Exception as e:
        print(f"blockdiag rel probe: FAILED {str(e)[:140]}")


if __name__ == "__main__":
    main()
    bench_blockdiag_rel(np.random.default_rng(1))
