"""Probe: fuse the head projection (+ residual) INTO the attention kernels.

Today each ViT block runs attention (d-major output) and `proj_rows` as two
pallas_calls: the (B', heads*d, S) d-major tensor takes an HBM write+read
round trip (~85 MB each way per windowed block at batch 8) plus a dispatch
boundary. With head_group == heads (all 16 heads in one program) the proj
contraction (K = heads*d = 1280) can run in-kernel on the assembled d-major
tile — the attention output never leaves VMEM, and the block residual rides
in as the proj epilogue (as `proj_rows` does today).

Variants (production ViT-H shapes, batch 8):
  windows: current chain [windows_s hg=8 kernel -> proj_rows(+res)]
           vs fused [windows_s hg=16 + in-kernel proj(+res)]
  global:  current chain [packed_global hg=8 (VPU-bias) -> proj_rows(+res)]
           vs fused [packed_global hg=16 + in-kernel proj(+res)]

Run on the real chip: python scripts/probe_pfuse.py
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
from camouflaged_vlm_tpu.ops.linear import proj_rows

B, HEADS, D = 8, 16, 80
DIM = HEADS * D
NF, NW = 16, 196
NG, H, W = 4096, 64, 64
HW = 128
SCALE = D ** -0.5
WB = 8


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


# ------------------------------------------------------------ fused windows
def _wfused_kernel(scale, heads, d, wb, wave,
                   q_ref, k_ref, v_ref, rel_ref, sel_ref, w_ref, b_ref,
                   r_ref, o_ref):
    sel = sel_ref[:]  # (32, Nw)
    for wi in range(wb):
        outs = []
        for h0 in range(0, heads, wave):
            scores = []
            for h in range(h0, h0 + wave):
                q = q_ref[0, wi][:, h * d : (h + 1) * d] * jnp.asarray(
                    scale, q_ref.dtype)
                k = k_ref[0, wi][:, h * d : (h + 1) * d]
                rel = rel_ref[:, wi, h * 32 : (h + 1) * 32]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s += jax.lax.dot(
                    rel.astype(q.dtype), sel, preferred_element_type=jnp.float32
                )
                scores.append(s)
            for j, h in enumerate(range(h0, h0 + wave)):
                v = v_ref[0, wi][:, h * d : (h + 1) * d]
                s = scores[j]
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                l = jnp.sum(p, axis=-1, keepdims=True)
                p = (p / l).astype(v.dtype)
                outs.append(jax.lax.dot_general(
                    v, p, (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(v.dtype))  # (d, Nw)
        o_full = jnp.concatenate(outs, axis=0)  # (heads*d, Nw)
        y = jax.lax.dot_general(
            o_full, w_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Nw, C)
        y += b_ref[:].astype(jnp.float32) + r_ref[0, wi].astype(jnp.float32)
        o_ref[0, wi] = y.astype(o_ref.dtype)


def wfused_call(qkv, rel_s, sel32, w, b, res, scale, heads, d,
                wb=WB, wave=8):
    BW, Nw, _ = qkv.shape
    C = w.shape[-1]
    nb = BW // wb
    kernel = functools.partial(_wfused_kernel, scale, heads, d, wb, wave)
    blk = lambda role: (lambda i: (i, 0, 0, role))
    qkv4 = qkv.reshape(nb, wb, Nw, 3 * heads * d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, wb, Nw, C), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, wb, Nw, heads * d), blk(0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wb, Nw, heads * d), blk(1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wb, Nw, heads * d), blk(2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Nw, wb, heads * 32), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((32, Nw), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((heads * d, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wb, Nw, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, wb, Nw, C), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BW * heads * Nw * Nw * (2 * d + 32)
            + 2 * BW * Nw * heads * d * C,
            bytes_accessed=qkv.size * 2 + rel_s.size * 2 + 2 * nb * wb * Nw * C * 2,
            transcendentals=BW * heads * Nw * Nw,
        ),
    )(qkv4, qkv4, qkv4, rel_s, sel32, w, b, res)


# ------------------------------------------------------------- fused global
def _gfused_kernel(scale, heads, d, H_, W_,
                   q_ref, k_ref, v_ref, rel_ref, w_ref, b_ref, r_ref, o_ref):
    N = k_ref.shape[1]
    block_q = q_ref.shape[1]
    outs = []
    for h in range(heads):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        relT = jnp.transpose(rel).astype(jnp.float32)
        bh = relT[0:H_]
        bw = relT[H_ : H_ + W_]
        BhT = jnp.broadcast_to(bh[:, None, :], (H_, W_, block_q)).reshape(N, block_q)
        BwT = jnp.broadcast_to(bw[None, :, :], (H_, W_, block_q)).reshape(N, block_q)
        sT = sT + BhT + BwT
        m = jnp.max(sT, axis=0, keepdims=True)
        p = jnp.exp(sT - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        p = (p / l).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            v, p, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(v.dtype))  # (d, block_q)
    o_full = jnp.concatenate(outs, axis=0)  # (heads*d, block_q)
    y = jax.lax.dot_general(
        o_full, w_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, C)
    y += b_ref[:].astype(jnp.float32) + r_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def gfused_call(qkv, rel_s, w, b, res, scale, heads, d, block_q=1024):
    B_, N, _ = qkv.shape
    C = w.shape[-1]
    kernel = functools.partial(_gfused_kernel, scale, heads, d, H, W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B_, N, C), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(B_, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, heads * d), lambda b_, i: (b_, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, heads * d), lambda b_, i: (b_, 0, 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, heads * d), lambda b_, i: (b_, 0, 2),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, 1, heads, HW), lambda b_, i: (i, b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((heads * d, C), lambda b_, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda b_, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, C), lambda b_, i: (b_, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, C), lambda b_, i: (b_, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * heads * N * N * 2 * d + 2 * B_ * N * heads * d * C,
            bytes_accessed=qkv.size * 2 + rel_s.size * 2 + 2 * B_ * N * C * 2,
            transcendentals=B_ * heads * N * N,
        ),
    )(qkv, qkv, qkv, rel_s, w, b, res)


def main():
    rng = np.random.default_rng(0)
    results = {}

    # ---------------- windows ----------------
    qkv_f = jnp.asarray(rng.standard_normal((B * NF, NW, 3 * DIM)) * 0.3,
                        jnp.bfloat16)
    rel_s = jnp.asarray(rng.standard_normal((NW, B * NF, HEADS * 32)) * 0.1,
                        jnp.bfloat16)
    sel32 = jnp.pad(fa.make_rel_scatter(14, 14), ((0, 4), (0, 0)))
    wp = jnp.asarray(rng.standard_normal((DIM, DIM)) * 0.02, jnp.bfloat16)
    bp = jnp.asarray(rng.standard_normal((1, DIM)) * 0.02, jnp.bfloat16)
    res_w = jnp.asarray(
        rng.standard_normal((B * NF // WB, WB, NW, DIM)) * 0.3, jnp.bfloat16)

    def win_cur(qkv, rel, resw):
        o = fa.flash_qkv_packed_windows_s(qkv, rel, sel32, SCALE, HEADS, D)
        o = o.reshape(B * NF // WB, WB, DIM, NW)
        return proj_rows(o, wp, bp, res=resw)

    def win_fused(qkv, rel, resw, wave=8):
        return wfused_call(qkv, rel, sel32, wp, bp, resw, SCALE, HEADS, D,
                           wave=wave)

    f_cur = jax.jit(win_cur)
    o_cur = f_cur(qkv_f, rel_s, res_w)
    t = timeit(f_cur, qkv_f, rel_s, res_w)
    print(f"win  cur (attn hg8 + proj_rows): {t:7.3f} ms", flush=True)
    results["win_cur"] = t
    for wave in (8, 4, 16):
        try:
            f = jax.jit(functools.partial(win_fused, wave=wave))
            o = f(qkv_f, rel_s, res_w)
            t = timeit(f, qkv_f, rel_s, res_w)
            e = err(o, o_cur)
            print(f"win  fused wave={wave:2d}           : {t:7.3f} ms  err={e:.2e}",
                  flush=True)
            results[f"win_fused_w{wave}"] = t
        except Exception as ex:
            print(f"win  fused wave={wave}: FAIL {type(ex).__name__}: {str(ex)[:250]}",
                  flush=True)

    # ---------------- global ----------------
    qkv_g = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)) * 0.3, jnp.bfloat16)
    rel_g = jnp.asarray(rng.standard_normal((NG, B, HEADS, HW)) * 0.05, jnp.bfloat16)
    sel_g = fa.make_rel_scatter(H, W)
    res_g = jnp.asarray(rng.standard_normal((B, NG, DIM)) * 0.3, jnp.bfloat16)

    def glob_cur(qkv, rel, resg):
        o = fa.flash_qkv_packed_global(qkv, rel, sel_g, SCALE, HEADS, D, H=H, W=W)
        return proj_rows(o[:, None], wp, bp, res=resg[:, None])[:, 0]

    def glob_fused(qkv, rel, resg, bq=1024):
        return gfused_call(qkv, rel, wp, bp, resg, SCALE, HEADS, D, block_q=bq)

    g_cur = jax.jit(glob_cur)
    og_cur = g_cur(qkv_g, rel_g, res_g)
    t = timeit(g_cur, qkv_g, rel_g, res_g, iters=10)
    print(f"glob cur (attn hg8 + proj_rows): {t:7.3f} ms", flush=True)
    results["glob_cur"] = t
    for bq in (1024, 512):
        try:
            f = jax.jit(functools.partial(glob_fused, bq=bq))
            o = f(qkv_g, rel_g, res_g)
            t = timeit(f, qkv_g, rel_g, res_g, iters=10)
            e = err(o, og_cur)
            print(f"glob fused bq={bq}         : {t:7.3f} ms  err={e:.2e}",
                  flush=True)
            results[f"glob_fused_bq{bq}"] = t
        except Exception as ex:
            print(f"glob fused bq={bq}: FAIL {type(ex).__name__}: {str(ex)[:250]}",
                  flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
