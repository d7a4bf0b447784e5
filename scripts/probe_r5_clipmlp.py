"""Round-5 probe: land-or-floor the CLIP MLP hidden-grid kernel.

VERDICT r4 #1b: the remaining-headroom note lists "CLIP MLP 562 us/call vs
~420 us MXU floor", but 562 was probe_clipmlp's round-3 SINGLE-CALL number
(dispatch-inflated); the post-landing trace reads 435 us/call. This probe
pins it with the chained methodology:

  cur      production `ln_mlp_residual_bt(hidden_grid=4)`
  hg2/hg8  chunk-count sweep
  noact    hidden-grid kernel with LN+GELU+residual stripped (two raw dots,
           same grid/blocking) — THE kernel-shape MXU floor: anything between
           cur and this is VPU work the MLP semantically requires
  analytic 4*B*S*K*H FLOPs at the 183 TF/s xprof in-program MLP rate

Run on the real chip: python scripts/probe_r5_clipmlp.py
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
CHAIN = 24


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def _kernel_floor(n_h, x_ref, w1_ref, w2_ref, o_ref, acc_ref):
    # two raw dots, hidden-chunked like production, zero VPU work
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = jax.lax.dot(x_ref[0], w1_ref[:], preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot(
        h.astype(o_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(i == n_h - 1)
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def floor_call(x, w1, w2, n_h=4):
    hc = H // n_h
    kernel = functools.partial(_kernel_floor, n_h)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, S, K), x.dtype),
        grid=(B, 1, n_h),
        in_specs=[
            pl.BlockSpec((1, S, K), lambda b, s, i: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, hc), lambda b, s, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, K), lambda b, s, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, K), lambda b, s, i: (b, s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, K), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * S * K * H,
            bytes_accessed=2 * x.size * x.dtype.itemsize + (w1.size + w2.size) * 2,
            transcendentals=0,
        ),
    )(x, w1, w2)


def chain(call, *args):
    x = args[0]
    y = x
    for _ in range(CHAIN):
        y = call(y, *args[1:])
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

    an = 4 * B * S * K * H / 183e12 * 1e6
    print(f"analytic MXU floor @183TF/s      : {an:6.1f} us/call", flush=True)

    # hg2/hg8 measured 564.3/560.6 us vs hg4's 556.9 in the first run of
    # this probe (chained) — chunk count is not the lever; not re-run.
    for name, hg in [("cur hidden_grid=4", 4)]:
        f = jax.jit(functools.partial(
            chain, functools.partial(
                lin.ln_mlp_residual_bt, eps=EPS, activation=ACT, hidden_grid=hg)))
        f(*args)
        t = timeit(f, *args)
        print(f"clip-mlp {name:20s}: {t / CHAIN * 1000:6.1f} us/call",
              flush=True)

    for name, hg in [("noact floor hg4", 4), ("noact floor hg2", 2)]:
        f = jax.jit(functools.partial(
            chain, lambda y, w1=w1, w2=w2, hg=hg: floor_call(y, w1, w2, n_h=hg)))
        f(x)
        t = timeit(f, x)
        print(f"clip-mlp {name:20s}: {t / CHAIN * 1000:6.1f} us/call",
              flush=True)


if __name__ == "__main__":
    main()
