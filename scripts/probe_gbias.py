"""Probe: global-attention rel bias WITHOUT the K=128 rel@sel MXU dot.

The decomposed rel-pos bias is separable: bias[q, k] = Bh[q, kh] + Bw[q, kw]
with k = kh*W + kw (W = 64). The production kernel regenerates it per q-tile
as rel(block_q,128) @ sel(128,4096) — 2*bq*128*N FLOPs/head, which is MORE
MXU work than the q@k score dot itself (K=80): the rel dot is ~44% of the
global block's MXU time.

Idea (v3, "transposed scores"): compute the score tile TRANSPOSED,
sT (N, block_q) = k @ q^T. In that orientation the bias is sublane-structured:
  bias^T[k, q] = relT[kh(k), q] + relT[64 + kw(k), q],   kh = k//64, kw = k%64
so it can be built with two VPU broadcasts of the (128, block_q) transposed
rel tile — BhT repeats each of the 64 h-rows 64x consecutively
(broadcast+reshape), BwT tiles the 64 w-rows 64x — and added to sT without
any MXU pass. The pv dot consumes p^T directly (contract dim 0), emitting the
SAME d-major (d, block_q) output tile as the production kernel.

Variants:
  v3a: relT via in-kernel jnp.transpose (Mosaic 2D transpose)
  v3b: relT via an MXU eye-dot (fallback if transpose lowering fails)

Compared end-to-end (rel einsum + kernel) vs the production s-major path on
identical inputs. Run on the real chip: python scripts/probe_gbias.py
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
from camouflaged_vlm_tpu.models.sam_encoder import rel_smajor_global

B, HEADS, D = 8, 16, 80
DIM = HEADS * D
NG, H, W = 4096, 64, 64
HW = H + W
HG = 8
SCALE = D ** -0.5


def timeit(fn, *args, iters=10):
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


def _kernel_v3(scale, head_group, d, use_eye_t, q_ref, k_ref, v_ref, rel_ref, o_ref):
    block_q = q_ref.shape[1]
    N = k_ref.shape[1]
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]   # (N, d)
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]              # (block_q, hw)
        # transposed scores: sT[k, q]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, block_q)
        if use_eye_t:
            eye = jnp.eye(block_q, dtype=rel.dtype)
            relT = jax.lax.dot_general(
                rel, eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (hw, block_q)
        else:
            relT = jnp.transpose(rel).astype(jnp.float32)  # (hw, block_q)
        bh = relT[0:H]   # (H, block_q)
        bw = relT[H:HW]  # (W, block_q)
        BhT = jnp.broadcast_to(bh[:, None, :], (H, W, block_q)).reshape(N, block_q)
        BwT = jnp.broadcast_to(bw[None, :, :], (H, W, block_q)).reshape(N, block_q)
        sT = sT + BhT + BwT
        m = jnp.max(sT, axis=0, keepdims=True)   # (1, block_q)
        p = jnp.exp(sT - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        p = (p / l).astype(v.dtype)              # (N, block_q)
        ot = jax.lax.dot_general(
            v, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (d, block_q)
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def v3_call(qkv, rel_s, scale, heads, d, block_q=1024, head_group=HG,
            use_eye_t=False):
    B_, N, _ = qkv.shape
    n_hg = heads // head_group
    gd = head_group * d
    kernel = functools.partial(_kernel_v3, scale, head_group, d, use_eye_t)
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
                pl.BlockSpec((block_q, 1, head_group, HW),
                             lambda b, g, i: (i, b, g, 0), memory_space=pltpu.VMEM),
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
            flops=2 * B_ * heads * N * N * 2 * d,
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=B_ * heads * N * N,
        ),
    )(qkv, qkv, qkv, rel_s)


def cur(qkv3d, rph, rpw):
    qh = qkv3d[:, :, :DIM].reshape(B, H, W, HEADS, D)
    rel_s, sel = rel_smajor_global(qh, rph, rpw, H, W)
    return fa.flash_qkv_packed_global(qkv3d, rel_s, sel, SCALE, HEADS, D, H=H, W=W)


def v3(qkv3d, rph, rpw, block_q=1024, use_eye_t=False):
    qh = qkv3d[:, :, :DIM].reshape(B, H, W, HEADS, D)
    rel_s, _ = rel_smajor_global(qh, rph, rpw, H, W)
    return v3_call(qkv3d, rel_s, SCALE, HEADS, D, block_q=block_q,
                   use_eye_t=use_eye_t)


def main():
    rng = np.random.default_rng(0)
    results = {}

    qkv_g = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)), jnp.bfloat16)
    rph_g = jnp.asarray(rng.standard_normal((127, D)) * 0.1, jnp.float32)
    rpw_g = jnp.asarray(rng.standard_normal((127, D)) * 0.1, jnp.float32)

    f_cur = jax.jit(cur)
    o_cur = f_cur(qkv_g, rph_g, rpw_g)
    t = timeit(f_cur, qkv_g, rph_g, rpw_g)
    print(f"glob cur (s-major rel dot)        : {t:7.3f} ms", flush=True)
    results["cur"] = t

    for name, bq, eye_t in [
        ("v3a bq1024 vpu-T", 1024, False),
        ("v3a bq512  vpu-T", 512, False),
        ("v3b bq1024 eye-T", 1024, True),
    ]:
        try:
            f = jax.jit(functools.partial(v3, block_q=bq, use_eye_t=eye_t))
            o = f(qkv_g, rph_g, rpw_g)
            t = timeit(f, qkv_g, rph_g, rpw_g)
            e = err(o, o_cur)
            print(f"glob {name}: {t:7.3f} ms  err={e:.2e}", flush=True)
            results[name] = t
        except Exception as ex:
            print(f"glob {name}: FAIL {type(ex).__name__}: {str(ex)[:300]}",
                  flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
