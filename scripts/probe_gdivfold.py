"""Probe: fold the softmax 1/l into the global kernel's d-major output.

The production global kernel (`_qkv_packed_global_kernel`) normalises the
full transposed probability matrix — an (N, block_q) f32 divide per head per
q-block — before the pv dot. The edge kernel already folds 1/l into its
(d, R) output columns ("1/d as many divides"); for the global kernel the
ratio is even better (N=4096 rows of divides -> d=80), and because scores
are TRANSPOSED the sum l is already row-oriented (1, block_q): the fold is a
plain broadcast multiply on the output, no ones-dot transpose trick needed.

probe_wsoft found divfold neutral for the windowed kernel (Nw=196 -> d=80 is
only 2.4x); this measures the 51x case.

Run on the real chip: python scripts/probe_gdivfold.py
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


def _g_kernel(scale, head_group, d, H_, W_, divfold,
              q_ref, k_ref, v_ref, rel_ref, o_ref):
    N = k_ref.shape[1]
    block_q = q_ref.shape[1]
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(scale, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        relT = jnp.transpose(rel).astype(o_ref.dtype)
        bh = relT[0:H_]
        bw = relT[H_ : H_ + W_]
        BhT = jnp.broadcast_to(bh[:, None, :], (H_, W_, block_q)).reshape(N, block_q)
        BwT = jnp.broadcast_to(bw[None, :, :], (H_, W_, block_q)).reshape(N, block_q)
        sT = sT + BhT.astype(jnp.float32) + BwT.astype(jnp.float32)
        p = fa._shift_exp(sT)
        l = jnp.sum(p, axis=0, keepdims=True)  # (1, block_q)
        if divfold:
            ot = jax.lax.dot_general(
                v, p.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, block_q)
            ot = ot * (1.0 / l)
        else:
            p = (p / l).astype(v.dtype)
            ot = jax.lax.dot_general(
                v, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def g_call(qkv, rel, divfold=False, block_q=512):
    Bq, N, _ = qkv.shape
    n_hg = HEADS // HG
    gd = HG * D
    kernel = functools.partial(_g_kernel, SCALE, HG, D, H, W, divfold)
    blk = lambda role: (lambda b, g, i: (b, i, role * n_hg + g))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bq, HEADS * D, N), qkv.dtype),
        grid_spec=pl.GridSpec(
            grid=(Bq, n_hg, N // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, gd), blk(0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, gd), lambda b, g, i: (b, 0, 2 * n_hg + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_q, 1, HG, HW),
                             lambda b, g, i: (i, b, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, gd, block_q), lambda b, g, i: (b, g, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bq * HEADS * N * N * 2 * D,
            bytes_accessed=qkv.size * 2 + rel.size * 2,
            transcendentals=Bq * HEADS * N * N,
        ),
    )(qkv, qkv, qkv, rel)


def chained(call_fn, qkv, *rest):
    y = qkv
    out = None
    for _ in range(REPS):
        out = call_fn(y, *rest)
        y = qkv * (1.0 + 0.0 * jnp.sum(out).astype(qkv.dtype))
    return out


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)) * 0.05, jnp.bfloat16)
    rel = jnp.asarray(rng.standard_normal((NG, B, HEADS, HW)) * 0.05, jnp.bfloat16)
    sel = jnp.asarray(fa.make_rel_scatter(H, W, jnp.float32))

    f_cur = jax.jit(functools.partial(
        chained, functools.partial(
            fa.flash_qkv_packed_global, sel=sel, scale=SCALE, heads=HEADS,
            d=D, H=H, W=W, head_group=HG)))
    o_cur = f_cur(qkv, rel)
    t = timeit(f_cur, qkv, rel)
    print(f"global cur (chained)     : {t:7.3f} ms/call", flush=True)

    for name, kw in [
        ("g0 repro (no fold)  ", dict(divfold=False)),
        ("g1 divfold          ", dict(divfold=True)),
        ("g1 divfold bq256    ", dict(divfold=True, block_q=256)),
    ]:
        try:
            f = jax.jit(functools.partial(chained, functools.partial(g_call, **kw)))
            o = f(qkv, rel)
            t = timeit(f, qkv, rel)
            print(f"global {name}: {t:7.3f} ms/call  err={err(o, o_cur):.2e}",
                  flush=True)
        except Exception as ex:
            print(f"global {name}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
