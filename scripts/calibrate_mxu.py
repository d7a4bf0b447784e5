"""Measure achievable bf16 matmul TFLOP/s and HBM GB/s on this chip."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args, iters=8, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    for M, K, N in [(8192, 8192, 8192), (4096, 1280, 5120), (4096, 5120, 1280)]:
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        dt = timed(f, (a, b))
        tf = 2 * M * K * N / dt / 1e12
        print(f"matmul {M}x{K}x{N}: {dt*1e3:.2f} ms = {tf:.1f} TFLOP/s")

    # memory bandwidth: elementwise add over 1 GB
    x = jnp.asarray(rng.standard_normal((512, 1024, 1024)), jnp.bfloat16)  # 1 GB
    g = jax.jit(lambda x: x * 1.0001 + 0.5)
    dt = timed(g, (x,))
    gbps = 2 * x.size * 2 / dt / 1e9
    print(f"elementwise 1GB: {dt*1e3:.2f} ms = {gbps:.0f} GB/s (r+w)")

    # dispatch overhead: trivial program
    y = jnp.zeros((8, 128), jnp.float32)
    h = jax.jit(lambda y: y + 1)
    dt = timed(h, (y,), iters=20)
    print(f"tiny program round-trip: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
