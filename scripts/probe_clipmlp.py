"""Probe: close the CLIP MLP's 25.2 ms vs 18.8 ms floor gap.

The CLIP tower's ln_mlp_residual_bt call runs grid (B=8, 1): one 577-row
program per image (577 is prime — no S tiling), so the LN / quickGELU VPU
stretches between the two MXU dots have almost no cross-program overlap
(only 8 program boundaries per call vs the encoder MLP's 84+).

Variants (all numerically identical to the current kernel):

  v1  hidden-chunked staging INSIDE the program: dot1 is issued in H/hc
      independent K-chunks, all score dots first, then gelu+dot2-accumulate
      per chunk — the independent chains let the hardware overlap chunk
      i+1's dot1 with chunk i's GELU (same trick as the windowed-attention
      staged dots).
  v2  interleaved chunk chain (dot1_i -> gelu_i -> dot2_i) — scheduler
      freedom without the accumulator pressure of v1's staged list.
  v3  grid over hidden chunks (Bp, H/hc) with the output block revisited
      ("arbitrary" last axis); LN recomputed per chunk — more program-level
      overlap, 4x the LN cost.

Run on the real chip: python scripts/probe_clipmlp.py
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

from camouflaged_vlm_tpu.ops import linear as lin

B, S, K, H = 8, 577, 1024, 4096
EPS = 1e-5
ACT = "quick_gelu"


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


def _ln(x_ref, g_ref, be_ref):
    x32 = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + EPS)
    return x32, xn * g_ref[:].astype(jnp.float32) + be_ref[:].astype(jnp.float32)


def _kernel_chunked(hc, staged, x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                    b2_ref, o_ref):
    x32, xn = _ln(x_ref, g_ref, be_ref)
    xnb = xn.astype(o_ref.dtype)
    n = H // hc
    acc = x32 + b2_ref[:].astype(jnp.float32)
    if staged:
        hs = []
        for i in range(n):
            h = jax.lax.dot(
                xnb, w1_ref[:, i * hc:(i + 1) * hc],
                preferred_element_type=jnp.float32,
            )
            hs.append(h)
        for i in range(n):
            h = lin._apply_act(hs[i] + b1_ref[0, i * hc:(i + 1) * hc], ACT)
            acc += jax.lax.dot(
                h.astype(o_ref.dtype), w2_ref[i * hc:(i + 1) * hc, :],
                preferred_element_type=jnp.float32,
            )
    else:
        for i in range(n):
            h = jax.lax.dot(
                xnb, w1_ref[:, i * hc:(i + 1) * hc],
                preferred_element_type=jnp.float32,
            )
            h = lin._apply_act(h + b1_ref[0, i * hc:(i + 1) * hc], ACT)
            acc += jax.lax.dot(
                h.astype(o_ref.dtype), w2_ref[i * hc:(i + 1) * hc, :],
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.astype(o_ref.dtype)


def chunked_call(x, gamma, beta, w1, b1, w2, b2, hc=1024, staged=True):
    kernel = functools.partial(_kernel_chunked, hc, staged)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, K), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, 1),
            in_specs=[
                pl.BlockSpec((1, S, K), lambda b_, s: (b_, s, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, H), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, K), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b_, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S, K), lambda b_, s: (b_, s, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * K * H,
            bytes_accessed=2 * x.size * x.dtype.itemsize + (w1.size + w2.size) * 2,
            transcendentals=B * S * H,
        ),
    )(x, gamma, beta, w1, b1, w2, b2)


def _kernel_hgrid(hc, x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref):
    i = pl.program_id(1)
    x32, xn = _ln(x_ref, g_ref, be_ref)
    h = jax.lax.dot(
        xn.astype(o_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32
    )
    h = lin._apply_act(h + b1_ref[:].astype(jnp.float32), ACT)
    part = jax.lax.dot(
        h.astype(o_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _():
        o_ref[0] = (part + x32 + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)

    @pl.when(i != 0)
    def _():
        o_ref[0] = (o_ref[0].astype(jnp.float32) + part).astype(o_ref.dtype)


def hgrid_call(x, gamma, beta, w1, b1, w2, b2, hc=1024):
    kernel = functools.partial(_kernel_hgrid, hc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, K), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, H // hc),
            in_specs=[
                pl.BlockSpec((1, S, K), lambda b_, i: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, hc), lambda b_, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hc), lambda b_, i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((hc, K), lambda b_, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S, K), lambda b_, i: (b_, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * K * H,
            bytes_accessed=2 * x.size * x.dtype.itemsize + (w1.size + w2.size) * 2,
            transcendentals=B * S * H,
        ),
    )(x, gamma, beta, w1, b1, w2, b2)


CHAIN = 24  # one CLIP tower's worth of MLP blocks in ONE program —
#             amortises the per-program dispatch that drowned the first
#             probe's single-call deltas (~1.4 ms/call inflation)


def chain(call, x, gamma, beta, w1, b1, w2, b2):
    y = x
    for _ in range(CHAIN):
        y = call(y, gamma, beta, w1, b1, w2, b2)
    return y


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, K)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal((1, K)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, H)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((1, H)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, K)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((1, K)) * 0.01, jnp.float32)
    args = (x, gamma, beta, w1, b1, w2, b2)

    f_cur = jax.jit(functools.partial(
        chain, functools.partial(lin.ln_mlp_residual_bt, eps=EPS, activation=ACT)))
    o_cur = f_cur(*args)
    t = timeit(f_cur, *args)
    print(f"clip-mlp cur (single dot)        : {t:7.3f} ms  "
          f"({t / CHAIN * 1000:6.1f} us/call)", flush=True)

    for name, fn in [
        ("v1 staged hc=1024 ", functools.partial(chunked_call, hc=1024, staged=True)),
        ("v1 staged hc=2048 ", functools.partial(chunked_call, hc=2048, staged=True)),
        ("v2 interleave 1024 ", functools.partial(chunked_call, hc=1024, staged=False)),
        ("v2 interleave 512  ", functools.partial(chunked_call, hc=512, staged=False)),
        ("v3 hgrid hc=1024   ", functools.partial(hgrid_call, hc=1024)),
    ]:
        try:
            f = jax.jit(functools.partial(chain, fn))
            o = f(*args)
            t = timeit(f, *args)
            print(f"clip-mlp {name}: {t:7.3f} ms  ({t / CHAIN * 1000:6.1f} us/call)"
                  f"  err={err(o, o_cur):.2e}", flush=True)
        except Exception as ex:
            print(f"clip-mlp {name}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
