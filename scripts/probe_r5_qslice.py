"""Round-5 probe: the global q-slice/reshape glue feeding the rel einsum.

VERDICT r4 #1c: ~2.7 ms/iter @ b8 of XLA glue sits in the global blocks'
rel path — `qkv3d[:, :, :dim].reshape(B, H, W, heads, hd)` materialises an
80-lane-minor 5D view (the physical 80->128 lane pad the packed kernels were
designed to avoid) before the combined-table einsum. Variants time the WHOLE
producer+consumer chain (slice -> rel einsum -> `flash_qkv_packed_global`)
so layout mismatches at the pallas boundary are charged to the variant that
causes them:

  v0  production: 5D (B, H, W, heads, hd) view + einsum "bhwnc,hwcj->hwbnj"
  v1  per-head lane slices, einsum "bnc,ncj->nbj" per head (no head-split
      reshape of q; 16 batched dots), results stacked on a new heads axis
  v2  4D (B, N, heads, hd) view + flat table einsum "bnhc,ncj->nbhj"
      (same pad, different surrounding layout chain)

Chained methodology (REPS per program). Run: python scripts/probe_r5_qslice.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from camouflaged_vlm_tpu.ops import flash_attention as fa

B, HEADS, D = 8, 16, 80
DIM = HEADS * D
NG, H, W = 4096, 64, 64
HW = H + W
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


def rel_v0(qkv3d, rcg):
    qh = qkv3d[:, :, :DIM].reshape(B, H, W, HEADS, D)
    return jnp.einsum("bhwnc,hwcj->hwbnj", qh, rcg.astype(qh.dtype)).reshape(
        NG, B, HEADS, HW)


def rel_v1(qkv3d, rcg):
    rcg_f = rcg.reshape(NG, D, HW)
    outs = []
    for h in range(HEADS):
        qh = qkv3d[:, :, h * D : (h + 1) * D]  # (B, N, D) contiguous lanes
        outs.append(jnp.einsum("bnc,ncj->nbj", qh, rcg_f.astype(qh.dtype)))
    return jnp.stack(outs, axis=2)  # (N, B, HEADS, HW)


def rel_v2(qkv3d, rcg):
    qh = qkv3d[:, :, :DIM].reshape(B, NG, HEADS, D)
    rcg_f = rcg.reshape(NG, D, HW)
    return jnp.einsum("bnhc,ncj->nbhj", qh, rcg_f.astype(qh.dtype))


def full(rel_fn, qkv, rcg, sel):
    y = qkv
    out = None
    for _ in range(REPS):
        rel_s = rel_fn(y, rcg)
        out = fa.flash_qkv_packed_global(
            y, rel_s, sel, scale=SCALE, heads=HEADS, d=D, H=H, W=W)
        y = qkv * (1.0 + 0.0 * jnp.sum(out).astype(qkv.dtype))
    return out


def main():
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((B, NG, 3 * DIM)) * 0.05, jnp.bfloat16)
    rcg = jnp.asarray(rng.standard_normal((H, W, D, HW)) * 0.05, jnp.bfloat16)
    sel = jnp.asarray((rng.random((HW, NG)) > 0.5), jnp.bfloat16)

    results = {}
    for name, fn in [("v0 production 5D einsum", rel_v0),
                     ("v1 per-head lane slices", rel_v1),
                     ("v2 4D flat-table einsum", rel_v2)]:
        try:
            f = jax.jit(functools.partial(full, fn))
            o = f(qkv, rcg, sel)
            t = timeit(f, qkv, rcg, sel)
            results[name] = (t, o)
            base = results.get("v0 production 5D einsum")
            e = err(o, base[1]) if base else 0.0
            print(f"qslice {name}: {t:7.3f} ms/call  err={e:.2e}", flush=True)
        except Exception as ex:
            print(f"qslice {name}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
