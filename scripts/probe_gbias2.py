"""Probe: shave the VPU-bias global kernel's remaining stalls.

After probe_gbias the global block runs at ~8.3 ms/program vs a ~3.5 ms MXU
floor (qk+pv only) — the per-head chain is dot -> transpose -> two VPU
broadcasts -> adds -> max/exp/sum -> pv dot, and the VPU stretch between the
two MXU dots stalls the MXU. Variants (all numerically softmax-equivalent):

  v4a  bf16 bias temps: build BhT/BwT in bf16 (halves the VPU/VMEM bytes of
       the two big broadcast temporaries), upcast only at the add.
  v4b  constant-shift softmax: skip the per-column max reduce+subtract;
       exp(sT - C) with a compile-time constant C (softmax is shift
       invariant; f32 exp holds to |s| ~ 88, ViT logits stay well below).
  v4c  2-head staging: issue head h+1's qk dot before head h's VPU stretch
       (accumulator pressure doubled but exposes MXU/VPU overlap — the
       pre-gbias staging probe lost because the kernel was then MXU-bound).
  v4d  a + b combined.

Run on the real chip: python scripts/probe_gbias2.py
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


def _head(q_ref, k_ref, v_ref, rel_ref, h, d):
    q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(SCALE, q_ref.dtype)
    k = k_ref[0][:, h * d : (h + 1) * d]
    v = v_ref[0][:, h * d : (h + 1) * d]
    rel = rel_ref[:, 0, h, :]
    return q, k, v, rel


def _bias(rel, block_q, bf16_bias):
    bt = jnp.bfloat16 if bf16_bias else jnp.float32
    relT = jnp.transpose(rel).astype(bt)  # (hw, block_q)
    bh = relT[0:H]
    bw = relT[H:HW]
    BhT = jnp.broadcast_to(bh[:, None, :], (H, W, block_q)).reshape(NG, block_q)
    BwT = jnp.broadcast_to(bw[None, :, :], (H, W, block_q)).reshape(NG, block_q)
    return BhT, BwT


def _kernel_v4(head_group, d, bf16_bias, const_shift, stage2,
               q_ref, k_ref, v_ref, rel_ref, o_ref):
    block_q = q_ref.shape[1]

    def score(h):
        q, k, v, rel = _head(q_ref, k_ref, v_ref, rel_ref, h, d)
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        BhT, BwT = _bias(rel, block_q, bf16_bias)
        sT = sT + BhT.astype(jnp.float32) + BwT.astype(jnp.float32)
        return sT, v

    def finish(sT, v):
        if const_shift:
            p = jnp.exp(sT - 20.0)
        else:
            m = jnp.max(sT, axis=0, keepdims=True)
            p = jnp.exp(sT - m)
        l = jnp.sum(p, axis=0, keepdims=True)
        p = (p / l).astype(v.dtype)
        return jax.lax.dot_general(
            v, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if stage2:
        prev = None
        for h in range(head_group):
            cur = score(h)
            if prev is not None:
                ph = h - 1
                ot = finish(*prev)
                o_ref[0, ph * d : (ph + 1) * d, :] = ot.astype(o_ref.dtype)
            prev = cur
        ot = finish(*prev)
        o_ref[0, (head_group - 1) * d :, :] = ot.astype(o_ref.dtype)
    else:
        for h in range(head_group):
            sT, v = score(h)
            ot = finish(sT, v)
            o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def v4_call(qkv, rel_s, block_q=1024, head_group=HG,
            bf16_bias=False, const_shift=False, stage2=False):
    B_, N, _ = qkv.shape
    n_hg = HEADS // head_group
    gd = head_group * D
    kernel = functools.partial(
        _kernel_v4, head_group, D, bf16_bias, const_shift, stage2
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B_, HEADS * D, N), qkv.dtype),
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
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B_ * HEADS * N * N * 2 * D,
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=B_ * HEADS * N * N,
        ),
    )(qkv, qkv, qkv, rel_s)


def run_variant(qkv3d, rph, rpw, **kw):
    qh = qkv3d[:, :, :DIM].reshape(B, H, W, HEADS, D)
    rel_s, _ = rel_smajor_global(qh, rph, rpw, H, W)
    return v4_call(qkv3d, rel_s, **kw)


def cur(qkv3d, rph, rpw):
    qh = qkv3d[:, :, :DIM].reshape(B, H, W, HEADS, D)
    rel_s, sel = rel_smajor_global(qh, rph, rpw, H, W)
    return fa.flash_qkv_packed_global(qkv3d, rel_s, sel, SCALE, HEADS, D, H=H, W=W)


def main():
    rng = np.random.default_rng(0)
    qkv_g = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)), jnp.bfloat16)
    rph_g = jnp.asarray(rng.standard_normal((127, D)) * 0.1, jnp.float32)
    rpw_g = jnp.asarray(rng.standard_normal((127, D)) * 0.1, jnp.float32)
    results = {}

    f_cur = jax.jit(cur)
    o_cur = f_cur(qkv_g, rph_g, rpw_g)
    t = timeit(f_cur, qkv_g, rph_g, rpw_g)
    print(f"glob cur (v3a production)       : {t:7.3f} ms", flush=True)
    results["cur"] = t

    for name, kw in [
        ("v4a bf16-bias      ", dict(bf16_bias=True)),
        ("v4b const-shift    ", dict(const_shift=True)),
        ("v4d a+b            ", dict(bf16_bias=True, const_shift=True)),
        ("v4c stage2         ", dict(stage2=True)),
        ("v4e a+b+c          ", dict(bf16_bias=True, const_shift=True, stage2=True)),
        ("v4f a+b bq512      ", dict(bf16_bias=True, const_shift=True, block_q=512)),
    ]:
        try:
            f = jax.jit(functools.partial(run_variant, **kw))
            o = f(qkv_g, rph_g, rpw_g)
            t = timeit(f, qkv_g, rph_g, rpw_g)
            e = err(o, o_cur)
            print(f"glob {name}: {t:7.3f} ms  err={e:.2e}", flush=True)
            results[name.strip()] = t
        except Exception as ex:
            print(f"glob {name}: FAIL {type(ex).__name__}: {str(ex)[:250]}",
                  flush=True)

    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
