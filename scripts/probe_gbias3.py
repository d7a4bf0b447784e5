"""Probe: fuse the global kernel's bias broadcasts into the adds.

After probe_gbias2 the global kernel is at ~10.1 ms/call vs a ~7 ms qk+pv
MXU floor. The remaining stretch builds two (N, block_q) broadcast
temporaries per head (`broadcast_to(...).reshape(N, bq)` forces Mosaic to
materialise them). Variants:

  v5a  3D broadcast-adds: view sT as (H, W, bq) (free sublane split) and add
       bh[:, None, :] / bw[None, :, :] directly — the compiler can fuse the
       broadcast into the add without a materialised temp.
  v5b  v5a at block_q 256 (more programs to overlap the leaner VPU stretch).
  v5c  v5a with f32 bias (skip the bf16 round-trip — if the adds fuse, the
       temp bytes no longer matter).

Chained methodology (see probe_wsoft.py): REPS calls per program.

Run on the real chip: python scripts/probe_gbias3.py
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


def _kernel_v5(head_group, d, bias3d, bias_dt,
               q_ref, k_ref, v_ref, rel_ref, o_ref):
    block_q = q_ref.shape[1]
    for h in range(head_group):
        q = q_ref[0][:, h * d : (h + 1) * d] * jnp.asarray(SCALE, q_ref.dtype)
        k = k_ref[0][:, h * d : (h + 1) * d]
        v = v_ref[0][:, h * d : (h + 1) * d]
        rel = rel_ref[:, 0, h, :]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, bq)
        relT = jnp.transpose(rel).astype(bias_dt)  # (hw, bq)
        bh = relT[0:H]
        bw = relT[H:HW]
        if bias3d:
            sT3 = sT.reshape(H, W, block_q)
            sT3 = sT3 + bh[:, None, :].astype(jnp.float32)
            sT3 = sT3 + bw[None, :, :].astype(jnp.float32)
            sT = sT3.reshape(NG, block_q)
        else:
            BhT = jnp.broadcast_to(bh[:, None, :], (H, W, block_q)).reshape(
                NG, block_q)
            BwT = jnp.broadcast_to(bw[None, :, :], (H, W, block_q)).reshape(
                NG, block_q)
            sT = sT + BhT.astype(jnp.float32) + BwT.astype(jnp.float32)
        p = jnp.exp(sT - 20.0)
        l = jnp.sum(p, axis=0, keepdims=True)
        p = (p / l).astype(v.dtype)
        ot = jax.lax.dot_general(
            v, p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, h * d : (h + 1) * d, :] = ot.astype(o_ref.dtype)


def v5_call(qkv, rel_s, block_q=512, bias3d=True, bias_dt=jnp.bfloat16):
    B_, N, _ = qkv.shape
    n_hg = HEADS // HG
    gd = HG * D
    kernel = functools.partial(_kernel_v5, HG, D, bias3d, bias_dt)
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
    t = timeit(f_cur, qkv, rel_s, sel)
    print(f"glob cur (v4 production)  : {t:7.3f} ms/call", flush=True)

    for name, kw in [
        ("v5z  2D re-impl     ", dict(bias3d=False)),
        ("v5a  3D-add bq512   ", dict(bias3d=True)),
        ("v5b  3D-add bq256   ", dict(bias3d=True, block_q=256)),
        ("v5c  3D-add f32 bias", dict(bias3d=True, bias_dt=jnp.float32)),
    ]:
        try:
            f = jax.jit(functools.partial(
                chained, lambda q, r, s, kw=kw: v5_call(q, r, **kw)))
            o = f(qkv, rel_s, sel)
            t = timeit(f, qkv, rel_s, sel)
            print(f"glob {name}: {t:7.3f} ms/call  err={err(o, o_cur):.2e}",
                  flush=True)
        except Exception as ex:
            print(f"glob {name}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
