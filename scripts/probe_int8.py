"""Probe: is int8 on the v5e MXU a real ~2x over bf16 at our MLP shapes?

The encoder MLP+qkv+proj kernels are ~217 ms of the 383 ms batch-8 eval
self time, all running at ~90% of the ~197 TF/s bf16 peak. v5e's MXU rate
doubles for int8 (~394 TOPS), so W8A8 quantization is the only remaining
lever with >5% end-to-end upside. Before building any quantized kernel,
measure what an int8 two-dot MLP-shaped chain ACTUALLY achieves, including
the in-kernel requantization (per-row abs-max -> scale -> cast) the real
thing would pay between the dots.

Variants (M=4096 compact-carry rows, K=1280, H=5120 — the ViT-H MLP):
  bf16      x bf16 -> dot1 -> identity act -> dot2 (f32 accum)  [baseline]
  int8-w8a8 x int8 -> dot1 (int32 acc) -> dequant f32 -> requant per-row
            int8 -> dot2 (int32 acc) -> f32 out
  int8-raw  both dots int8 with NO requant between (upper bound: feeds
            dot2 a bit-sliced int8 view of dot1's accumulator)

Timing: chained in-program calls (PERF.md probe-methodology note) — the
output feeds the next rep's activation so nothing is dead-code-eliminated.

Run on the real chip: python scripts/probe_int8.py
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

M, K, H = 4096, 1280, 5120
TILE_M = 512
CHAIN = 10
FLOPS_PER_CALL = 2 * M * K * H + 2 * M * H * K


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[0].astype(jnp.float32)[:8, :8]))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(jnp.sum(outs[-1][0].astype(jnp.float32)[:8, :8]))
    return (time.perf_counter() - t0) / iters * 1e3


def _bf16_kernel(x_ref, w1_ref, w2_ref, o_ref):
    h = jax.lax.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = jax.lax.dot(
        h.astype(jnp.bfloat16), w2_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _w8a8_kernel(x_ref, w1_ref, w2_ref, o_ref):
    h32 = jax.lax.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.int32)
    # dequant (single scalar scale suffices for a rate probe) + per-row
    # requantization for dot2 — the VPU work a real W8A8 kernel pays.
    h = h32.astype(jnp.float32) * (1.0 / 127.0)
    amax = jnp.max(jnp.abs(h), axis=-1, keepdims=True) + 1e-6
    hq = jnp.round(h * (127.0 / amax)).astype(jnp.int8)
    y32 = jax.lax.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (
        y32.astype(jnp.float32) * (amax / (127.0 * 127.0))
    ).astype(o_ref.dtype)


def _int8_raw_kernel(x_ref, w1_ref, w2_ref, o_ref):
    h32 = jax.lax.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.int32)
    hq = (h32 >> 8).astype(jnp.int8)  # upper-bound variant: no real requant
    y32 = jax.lax.dot(hq, w2_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = y32.astype(jnp.float32).astype(o_ref.dtype)


def make_call(kernel, x_dt, w_dt, o_dt):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, K), o_dt),
        grid_spec=pl.GridSpec(
            grid=(M // TILE_M,),
            in_specs=[
                pl.BlockSpec((TILE_M, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE_M, K), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=FLOPS_PER_CALL, bytes_accessed=M * K * 2 + K * H * 2 + H * K * 2,
            transcendentals=0,
        ),
    )


def chain_bf16(x, w1, w2):
    call = make_call(_bf16_kernel, jnp.bfloat16, jnp.bfloat16, jnp.bfloat16)
    y = x
    for _ in range(CHAIN):
        y = call(y, w1, w2)
    return (y,)


def chain_int8(kernel, x, w1, w2):
    call = make_call(kernel, jnp.int8, jnp.int8, jnp.float32)
    y = x
    for _ in range(CHAIN):
        yf = call(y, w1, w2)
        # re-quantize outside (XLA) to keep the chain int8-in
        amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True) + 1e-6
        y = jnp.round(yf * (127.0 / amax)).astype(jnp.int8)
    return (yf,)


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w1b = jnp.asarray(rng.standard_normal((K, H)) * 0.02, jnp.bfloat16)
    w2b = jnp.asarray(rng.standard_normal((H, K)) * 0.02, jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    w1q = jnp.asarray(rng.integers(-127, 127, (K, H)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 127, (H, K)), jnp.int8)

    for name, fn, args in [
        ("bf16 two-dot         ", jax.jit(chain_bf16), (xb, w1b, w2b)),
        ("int8 raw (no requant)", jax.jit(functools.partial(chain_int8, _int8_raw_kernel)), (xq, w1q, w2q)),
        ("int8 w8a8 (requant)  ", jax.jit(functools.partial(chain_int8, _w8a8_kernel)), (xq, w1q, w2q)),
    ]:
        try:
            t = timeit(fn, *args)
            per_call = t / CHAIN
            rate = FLOPS_PER_CALL / (per_call * 1e-3) / 1e12
            print(f"{name}: {t:8.3f} ms chain  {per_call:7.3f} ms/call  "
                  f"{rate:6.1f} T{'OP' if 'int8' in name else 'F'}/s", flush=True)
        except Exception as ex:
            print(f"{name}: FAIL {type(ex).__name__}: {str(ex)[:300]}", flush=True)


if __name__ == "__main__":
    main()
