"""Second-generation staging experiments for the attention kernels:
  * windowed FULLY-staged: scores all -> softmax all -> pv all
  * global pair-staged: scores for 2 heads, then their softmax+pv
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


def win_fully_staged(qkv, rel, sel32, scale, heads, d, head_group=8, win_group=1):
    B, nwin, Nw, _ = qkv.shape
    n_hg = heads // head_group
    gd = head_group * d

    def kern(q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
        sel = sel_ref[:]
        ss = []
        for h in range(head_group):
            q = q_ref[0][:, :, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
            k = k_ref[0][:, :, h * d : (h + 1) * d]
            rel = rel_ref[0][:, :, h * 32 : (h + 1) * 32]
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            s += jax.lax.dot_general(rel, sel, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            ss.append(s)
        ps = []
        for h in range(head_group):
            s = ss[h]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            ps.append((p / l).astype(q_ref.dtype))
        for h in range(head_group):
            v = v_ref[0][:, :, h * d : (h + 1) * d]
            o = jax.lax.dot_general(ps[h], v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
            o_ref[0, h] = o.astype(o_ref.dtype)

    blk = lambda role: (lambda b, w, g: (b, w, 0, role * n_hg + g))
    return pl.pallas_call(
        kern,
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


def global_pair_staged(qkv, rel, sel, scale, heads, d, block_q=1024, head_group=8):
    B, N, _ = qkv.shape
    hw = sel.shape[0]
    n_hg = heads // head_group
    gd = head_group * d

    def kern(q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
        selm = sel_ref[:]
        for h0 in range(0, head_group, 2):
            ss = []
            for h in (h0, h0 + 1):
                q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
                k = k_ref[0][:, h * d : (h + 1) * d]
                rel = rel_ref[0][:, h * hw : (h + 1) * hw]
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                s += jax.lax.dot(rel, selm, preferred_element_type=jnp.float32)
                ss.append(s)
            for i, h in enumerate((h0, h0 + 1)):
                v = v_ref[0][:, h * d : (h + 1) * d]
                s = ss[i]
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=1, keepdims=True)
                p = (p / l).astype(v.dtype)
                o_ref[0, h] = jax.lax.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)

    blk = lambda role: (lambda b, g, i: (b, i, role * n_hg + g))
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, heads, N, d), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, n_hg + g), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 2 * n_hg + g), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, head_group * hw), lambda b, g, i: (b, i, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((hw, N), lambda b, g, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, head_group, block_q, d), lambda b, g, i: (b, g, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(qkv, qkv, qkv, rel, sel)


def main():
    rng = np.random.default_rng(0)
    B, heads, d = 8, 16, 80
    scale = d ** -0.5

    nwin, Nw = 25, 196
    qkv = jnp.asarray(rng.standard_normal((B, nwin, Nw, 3 * heads * d)) * 0.1, jnp.bfloat16)
    rel = jnp.asarray(rng.standard_normal((B, nwin, Nw, heads * 32)) * 0.1, jnp.bfloat16)
    sel32 = jnp.pad(fa.make_rel_scatter(14, 14), ((0, 4), (0, 0)))

    f = jax.jit(lambda q, r: fa.flash_qkv_packed_windows(q, r, sel32, scale, heads, d))
    print(f"win staged (prod)    : {timeit(f, qkv, rel):7.3f} ms")
    for wg in (1, 5):
        f = jax.jit(lambda q, r, wg=wg: win_fully_staged(q, r, sel32, scale, heads, d, win_group=wg))
        try:
            print(f"win FULLY staged wg={wg}: {timeit(f, qkv, rel):7.3f} ms")
        except Exception as e:
            print(f"win FULLY staged wg={wg}: FAILED {str(e)[:100]}")

    N = 4096
    qkv_g = jnp.asarray(rng.standard_normal((B, N, 3 * heads * d)) * 0.1, jnp.bfloat16)
    rel_g = jnp.asarray(rng.standard_normal((N, B, heads, 128)) * 0.1, jnp.bfloat16)  # s-major (rel-v2)
    sel_g = fa.make_rel_scatter(64, 64)
    f = jax.jit(lambda q, r: fa.flash_qkv_packed_global(q, r, sel_g, scale, heads, d, H=64, W=64))
    print(f"global (prod bq=1024): {timeit(f, qkv_g, rel_g):7.3f} ms")
    for bq in (512, 1024):
        f = jax.jit(lambda q, r, bq=bq: global_pair_staged(q, r, sel_g, scale, heads, d, block_q=bq))
        try:
            print(f"global PAIR bq={bq}  : {timeit(f, qkv_g, rel_g):7.3f} ms")
        except Exception as e:
            print(f"global PAIR bq={bq}: FAILED {str(e)[:100]}")


if __name__ == "__main__":
    main()
