"""Probe: encoder MLP — last ~9% from peak (179 vs 197 TF/s).

The windowed MLP kernel (grid (128, 1), (196, 1280) rows, H=5120) runs at
~91% of bf16 peak; the residue is the LN/GELU VPU stretches that the
cross-program overlap can't fully hide. Variants:

  m1  bf16 GELU: activation computed on the bf16-rounded hidden (halves the
      VPU bytes/ops of the biggest stretch). Numerics: h is rounded to bf16
      BEFORE the tanh GELU instead of after — deviation ~bf16 eps, same
      order as the already-accepted tanh-vs-erf approximation.
  m2  staged hidden chunks (4x1280): all dot1 chunks issued first, then
      GELU+dot2-accumulate per chunk — intra-program MXU/VPU pipelining.
  m3  m1+m2.

Chained methodology (see probe_wsoft.py).

Run on the real chip: python scripts/probe_mlpact.py
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

BW, S, K, H = 128, 196, 1280, 5120
EPS = 1e-6
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


def _kernel(bf16_act, hc, staged,
            x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x32 = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + EPS)
    xn = xn * g_ref[:].astype(jnp.float32) + be_ref[:].astype(jnp.float32)
    xnb = xn.astype(o_ref.dtype)
    acc = x32 + b2_ref[:].astype(jnp.float32)
    n = H // hc

    def act(h, i):
        h = h + b1_ref[0, i * hc:(i + 1) * hc]
        if bf16_act:
            h = h.astype(o_ref.dtype)
        return lin._apply_act(h, "gelu_tanh").astype(o_ref.dtype)

    if staged:
        hs = [
            jax.lax.dot(xnb, w1_ref[:, i * hc:(i + 1) * hc],
                        preferred_element_type=jnp.float32)
            for i in range(n)
        ]
        for i in range(n):
            acc += jax.lax.dot(act(hs[i], i), w2_ref[i * hc:(i + 1) * hc, :],
                               preferred_element_type=jnp.float32)
    else:
        for i in range(n):
            h = jax.lax.dot(xnb, w1_ref[:, i * hc:(i + 1) * hc],
                            preferred_element_type=jnp.float32)
            acc += jax.lax.dot(act(h, i), w2_ref[i * hc:(i + 1) * hc, :],
                               preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def mlp_call(x, gamma, beta, w1, b1, w2, b2, bf16_act=False, hc=H, staged=False):
    kernel = functools.partial(_kernel, bf16_act, hc, staged)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BW, S, K), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(BW, 1),
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
            flops=4 * BW * S * K * H,
            bytes_accessed=2 * x.size * x.dtype.itemsize + (w1.size + w2.size) * 2,
            transcendentals=BW * S * H,
        ),
    )(x, gamma, beta, w1, b1, w2, b2)


def chained(call_fn, x, *rest):
    y = x
    out = None
    for _ in range(REPS):
        out = call_fn(y, *rest)
        y = x * (1.0 + 0.0 * jnp.sum(out).astype(x.dtype))
    return out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BW, S, K)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal((1, K)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((1, K)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, H)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((1, H)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, K)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((1, K)) * 0.01, jnp.float32)
    args = (x, gamma, beta, w1, b1, w2, b2)

    f_cur = jax.jit(functools.partial(
        chained, functools.partial(lin.ln_mlp_residual_bt, eps=EPS,
                                   activation="gelu_tanh")))
    o_cur = f_cur(*args)
    t = timeit(f_cur, *args)
    print(f"enc-mlp cur              : {t:7.3f} ms/call", flush=True)

    for name, kw in [
        ("m0 re-impl          ", dict()),
        ("m1 bf16 gelu        ", dict(bf16_act=True)),
        ("m2 staged hc=1280   ", dict(hc=1280, staged=True)),
        ("m3 m1+m2            ", dict(bf16_act=True, hc=1280, staged=True)),
    ]:
        try:
            f = jax.jit(functools.partial(
                chained, lambda x_, *r: mlp_call(x_, *r, **kw)))
            o = f(*args)
            t = timeit(f, *args)
            print(f"enc-mlp {name}: {t:7.3f} ms/call  err={err(o, o_cur):.2e}",
                  flush=True)
        except Exception as ex:
            print(f"enc-mlp {name}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
