"""Round-5 probe: land-or-floor the global kernel's relT/broadcast stretch.

VERDICT r4 #1a: the remaining-headroom note claims ~10.1 ms/call vs a ~7 ms
qk+pv MXU floor, but probe_gbias3's chained methodology already measured the
production kernel at 7.2 ms/call — the 10.1 was dispatch-inflated. This probe
settles it by DECOMPOSING the chained per-call time:

  cur     production `flash_qkv_packed_global` (bias + const-shift softmax)
  nobias  same kernel with the relT transpose + broadcast adds REMOVED
          (softmax kept) — upper bound on what any bias restructure can save
  nosm    no bias AND no softmax (p = cast(sT)) — the pure qk+pv MXU floor
  bigT    ONE (block_q, hg*hw) transpose per program instead of 8 per-head
          (512, 128) transposes, heads then sublane-sliced from the
          transposed tile — fewer, larger VPU transposes

Methodology: chained calls (REPS per program, scalar dependency) per
PERF.md's probe-methodology note; ~36 ms tunnel round-trip paid once.

Run on the real chip: python scripts/probe_r5_global.py
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

B, HEADS, D = 8, 16, 80
DIM = HEADS * D
NG, H, W = 4096, 64, 64
HW = H + W
HG = 8
SCALE = D ** -0.5
REPS = 4


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3 / REPS


def err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def _kernel_v6(head_group, d, bias, softmax, bigT,
               q_ref, k_ref, v_ref, rel_ref, o_ref):
    block_q = q_ref.shape[1]
    if bias and bigT:
        relg = rel_ref[:, 0, :, :].reshape(block_q, head_group * HW)
        relgT = jnp.transpose(relg).astype(o_ref.dtype)  # (hg*hw, bq): ONE transpose
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(SCALE, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]
        v = v_ref[0][:, h * d : (h + 1) * d]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, bq)
        if bias:
            if bigT:
                relT = relgT[h * HW : (h + 1) * HW]  # sublane slice
            else:
                relT = jnp.transpose(rel_ref[:, 0, h, :]).astype(o_ref.dtype)
            bh = relT[0:H]
            bw = relT[H:HW]
            BhT = jnp.broadcast_to(bh[:, None, :], (H, W, block_q)).reshape(
                NG, block_q)
            BwT = jnp.broadcast_to(bw[None, :, :], (H, W, block_q)).reshape(
                NG, block_q)
            sT = sT + BhT.astype(jnp.float32) + BwT.astype(jnp.float32)
        if softmax:
            p = fa._shift_exp(sT)
            l = jnp.sum(p, axis=0, keepdims=True)
            p = (p / l).astype(v.dtype)
        else:
            p = sT.astype(v.dtype)
        ot = jax.lax.dot_general(
            v, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def v6_call(qkv, rel_s, block_q=512, bias=True, softmax=True, bigT=False):
    B_, N, _ = qkv.shape
    n_hg = HEADS // HG
    gd = HG * D
    kernel = functools.partial(_kernel_v6, HG, D, bias, softmax, bigT)
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
                pl.BlockSpec((block_q, 1, HG, HW),
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
            flops=2 * B_ * HEADS * NG * NG * 2 * D,
            bytes_accessed=qkv.size * 2 + rel_s.size * 2,
            transcendentals=B_ * HEADS * NG * NG,
        ),
    )(qkv, qkv, qkv, rel_s)


def chained(call_fn, qkv, rel_s, sel):
    y = qkv
    out = None
    for _ in range(REPS):
        out = call_fn(y, rel_s, sel)
        y = qkv * (1.0 + 0.0 * jnp.sum(out).astype(qkv.dtype))
    return out


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)) * 0.05, jnp.bfloat16)
    rel_s = jnp.asarray(rng.standard_normal((NG, B, HEADS, HW)) * 0.05, jnp.bfloat16)
    sel = jnp.asarray((rng.random((HW, NG)) > 0.5), jnp.bfloat16)

    f_cur = jax.jit(functools.partial(
        chained, functools.partial(
            fa.flash_qkv_packed_global, scale=SCALE, heads=HEADS, d=D, H=H, W=W)))
    o_cur = f_cur(qkv, rel_s, sel)
    t_cur = timeit(f_cur, qkv, rel_s, sel)
    print(f"glob cur (v4 production)     : {t_cur:7.3f} ms/call", flush=True)

    for name, kw, comparable in [
        ("v6r  re-impl (sanity)  ", dict(), True),
        ("v6T  one big transpose ", dict(bigT=True), True),
        ("v6nb NO bias           ", dict(bias=False), False),
        ("v6nm NO bias NO softmax", dict(bias=False, softmax=False), False),
    ]:
        try:
            f = jax.jit(functools.partial(
                chained, lambda q, r, s, kw=kw: v6_call(q, r, **kw)))
            o = f(qkv, rel_s, sel)
            t = timeit(f, qkv, rel_s, sel)
            e = err(o, o_cur) if comparable else float("nan")
            print(f"glob {name}: {t:7.3f} ms/call  "
                  f"({t - t_cur:+6.3f})  err={e:.2e}", flush=True)
        except Exception as ex:
            print(f"glob {name}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
