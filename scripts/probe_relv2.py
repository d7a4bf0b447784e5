"""Probe the rel-pos v2 layouts: kill the ~16 ms/iter of XLA glue around the
windowed/global rel einsums (BENCH_r03 trace: an 8.5 ms pathological 32-lane
transposing copy + 4.7 ms merge reshape on the windowed path; a 12.6 ms
einsum/concat/pad/copy chain on the global path).

Idea: let the rel einsum emit its NATURAL batched-matmul layout (position-
major) and make the attention kernels consume it directly:

  A. global: ONE einsum against a combined per-(qh,qw) table
     Rcomb_g (64,64,80,128) (84 MB transient, [Rh | Rw] lanes) producing
     rel_s (N, B, heads, 128) position-major — the kernel sublane-selects
     heads from a (block_q, 1, head_group, 128) block.
  B. windowed: the 1280->(2,640) lhs split is tile-aligned (640 % 128 == 0),
     so contracting against Rblk8 (196, 640, 256) = kron(I8, Rcomb) emits
     rel already packed [h0..h7]*32 in 256 aligned lanes, position-major
     (S, B*nf, 512) after a free (2,256)->512 merge; the kernel reads
     (S, 1, 1, 256) blocks.

Both are compared end-to-end (rel build + attention kernel) against the
production path on identical inputs. Run on the real chip:
python scripts/probe_relv2.py
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
from camouflaged_vlm_tpu.ops.rel_pos import get_rel_pos_table
from camouflaged_vlm_tpu.models.sam_encoder import (
    rel_and_scatter, rel_packed32, make_rcomb,
)

B, HEADS, D = 8, 16, 80
DIM = HEADS * D
NF, NW = 16, 196     # full windows per image, window rows
NG, HW = 4096, 128   # global tokens, H+W
HG = 8
SCALE = D ** -0.5


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


# ---------------------------------------------------------------- A: global
def make_rcomb_global(H, W, rel_pos_h, rel_pos_w, dt):
    """(H, W, hd, H+W): lane j < H holds Rh[qh, j], lanes H.. hold Rw[qw, .]."""
    Rh = get_rel_pos_table(H, H, rel_pos_h).astype(dt)  # (H, kh, hd)
    Rw = get_rel_pos_table(W, W, rel_pos_w).astype(dt)
    hd = Rh.shape[-1]
    return jnp.concatenate(
        [
            jnp.broadcast_to(jnp.transpose(Rh, (0, 2, 1))[:, None], (H, W, hd, H)),
            jnp.broadcast_to(jnp.transpose(Rw, (0, 2, 1))[None, :], (H, W, hd, W)),
        ],
        axis=-1,
    )


def _global_kernel_v2(scale, head_group, d, hw, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    sel = sel_ref[:]  # (hw, N)
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]  # (block_q, hw) — sublane select
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s += jax.lax.dot(rel.astype(q.dtype), sel, preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        p = (p / l).astype(v.dtype)
        ot = jax.lax.dot_general(
            v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def global_v2_kernel_call(qkv, rel_s, sel, scale, heads, d, block_q=1024, head_group=HG):
    # rel_s: (N, B, heads, hw) position-major
    B_, N, _ = qkv.shape
    hw = sel.shape[0]
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_global_kernel_v2, scale, head_group, d, hw)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B_, heads * d, N), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B_, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), lambda b, g, i: (b, i, 0 * n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 1 * n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 2 * n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, 1, head_group, hw),
                             lambda b, g, i: (i, b, g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((hw, N), lambda b, g, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, gd, block_q), lambda b, g, i: (b, g, i), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * heads * N * N * (2 * d + hw),
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=B_ * heads * N * N,
        ),
    )(qkv, qkv, qkv, rel_s, sel)


def global_cur(qkv3d, rph, rpw):
    qh = qkv3d[:, :, :DIM].reshape(B, 64, 64, HEADS, D)
    rel, sel = rel_and_scatter(qh, rph, rpw, 64, 64)
    return fa.flash_qkv_packed_global(
        qkv3d, rel.reshape(B, NG, HEADS * HW), sel, SCALE, HEADS, D
    )


def global_v2(qkv3d, rph, rpw):
    qh = qkv3d[:, :, :DIM].reshape(B, 64, 64, HEADS, D)
    rcg = make_rcomb_global(64, 64, rph, rpw, qkv3d.dtype)
    rel_s = jnp.einsum("bhwnc,hwcj->hwbnj", qh, rcg).reshape(NG, B, HEADS, HW)
    sel = fa.make_rel_scatter(64, 64, dtype=qkv3d.dtype)
    return global_v2_kernel_call(qkv3d, rel_s, sel, SCALE, HEADS, D)


# ---------------------------------------------------------------- B: windowed
WB = 8  # windows per program (block dim -2 must be divisible by 8)


def _windows_kernel_v2(scale, head_group, d, q_ref, k_ref, v_ref, rel_ref, sel_ref, o_ref):
    sel = sel_ref[:]  # (32, Nw)
    for wi in range(WB):
        scores = []
        for h in range(head_group):
            q = q_ref[0, wi][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
            k = k_ref[0, wi][:, h * d : (h + 1) * d]   # (Nw, d)
            rel = rel_ref[:, wi, h * 32 : (h + 1) * 32]  # (Nw, 32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (Nw, Nw)
            s += jax.lax.dot(
                rel.astype(q.dtype), sel, preferred_element_type=jnp.float32
            )
            scores.append(s)
        for h in range(head_group):
            v = v_ref[0, wi][:, h * d : (h + 1) * d]
            s = scores[h]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(v.dtype)
            ot = jax.lax.dot_general(
                v, p, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (d, Nw)
            o_ref[0, wi, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def windows_v2_kernel_call(qkv, rel_s, sel32, scale, heads, d, head_group=HG):
    # qkv: (BW/WB, WB, Nw, 3*dim); rel_s: (Nw, BW, heads*32) position-major
    nb, _, Nw, _ = qkv.shape
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_windows_kernel_v2, scale, head_group, d)
    blk = lambda role: (lambda b, g: (b, 0, 0, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, WB, heads * d, Nw), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(nb, n_hg),
            in_specs=[
                pl.BlockSpec((1, WB, Nw, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, WB, Nw, gd), blk(1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, WB, Nw, gd), blk(2), memory_space=pltpu.VMEM),
                pl.BlockSpec((Nw, WB, head_group * 32),
                             lambda b, g: (0, b, g), memory_space=pltpu.VMEM),
                pl.BlockSpec((32, Nw), lambda b, g: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, WB, gd, Nw), lambda b, g: (b, 0, g, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * WB * heads * Nw * Nw * (2 * d + 32),
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=nb * WB * heads * Nw * Nw,
        ),
    )(qkv, qkv, qkv, rel_s, sel32)


def make_rblk8(rph, rpw, dt):
    """(Nw, 640, 256) = kron(I8, Rcomb[s]) — block-diagonal per position."""
    rc = make_rcomb(14, 14, rph, rpw, dt).reshape(NW, D, 32)
    eye = jnp.eye(8, dtype=dt)
    return jax.vmap(lambda r: jnp.kron(eye, r))(rc)


def win_cur(qkv_f, rph, rpw):
    qh = qkv_f[:, :, :DIM].reshape(B * NF, 14, 14, HEADS, D)
    rel_p, sel32 = rel_packed32(qh, rph, rpw, 14, 14)
    return fa.flash_qkv_packed_windows(
        qkv_f.reshape(B, NF, NW, 3 * DIM),
        rel_p.reshape(B, NF, NW, HEADS * 32),
        sel32, SCALE, HEADS, D,
    )


def win_v2(qkv_f, rph, rpw):
    rblk = make_rblk8(rph, rpw, qkv_f.dtype)
    q2 = qkv_f[:, :, :DIM].reshape(B * NF, NW, 2, 640)
    rel_s = jnp.einsum("wsgc,scj->swgj", q2, rblk).reshape(NW, B * NF, HEADS * 32)
    sel = fa.make_rel_scatter(14, 14, dtype=qkv_f.dtype)
    sel32 = jnp.pad(sel, ((0, 32 - 28), (0, 0)))
    out = windows_v2_kernel_call(
        qkv_f.reshape(B * NF // WB, WB, NW, 3 * DIM), rel_s, sel32, SCALE, HEADS, D
    )
    return out.reshape(B, NF, HEADS * D, NW)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # ---------------- windowed ----------------
    qkv_f = jnp.asarray(rng.standard_normal((B * NF, NW, 3 * DIM)), jnp.bfloat16)
    rph_w = jnp.asarray(rng.standard_normal((27, D)) * 0.1, jnp.float32)
    rpw_w = jnp.asarray(rng.standard_normal((27, D)) * 0.1, jnp.float32)

    f_cur = jax.jit(win_cur)
    f_v2 = jax.jit(win_v2)
    o_cur = f_cur(qkv_f, rph_w, rpw_w)
    t = timeit(f_cur, qkv_f, rph_w, rpw_w)
    print(f"win  cur (rel_packed32 + kernel): {t:7.3f} ms", flush=True)
    results["win_cur"] = t
    try:
        o_v2 = f_v2(qkv_f, rph_w, rpw_w)
        t = timeit(f_v2, qkv_f, rph_w, rpw_w)
        e = err(o_v2, o_cur)
        print(f"win  v2  (kron einsum + s-major): {t:7.3f} ms  err={e:.2e}", flush=True)
        results["win_v2"] = t
    except Exception as ex:
        print(f"win  v2 : FAIL {type(ex).__name__}: {str(ex)[:300]}", flush=True)

    # ---------------- global ----------------
    qkv_g = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)), jnp.bfloat16)
    rph_g = jnp.asarray(rng.standard_normal((127, D)) * 0.1, jnp.float32)
    rpw_g = jnp.asarray(rng.standard_normal((127, D)) * 0.1, jnp.float32)

    g_cur = jax.jit(global_cur)
    g_v2 = jax.jit(global_v2)
    og_cur = g_cur(qkv_g, rph_g, rpw_g)
    t = timeit(g_cur, qkv_g, rph_g, rpw_g, iters=10)
    print(f"glob cur (rel_and_scatter + kernel): {t:7.3f} ms", flush=True)
    results["glob_cur"] = t
    try:
        og_v2 = g_v2(qkv_g, rph_g, rpw_g)
        t = timeit(g_v2, qkv_g, rph_g, rpw_g, iters=10)
        e = err(og_v2, og_cur)
        print(f"glob v2  (Rcomb_g + s-major)      : {t:7.3f} ms  err={e:.2e}", flush=True)
        results["glob_v2"] = t
    except Exception as ex:
        print(f"glob v2 : FAIL {type(ex).__name__}: {str(ex)[:300]}", flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
