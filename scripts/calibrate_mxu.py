"""Measure achievable bf16 matmul TFLOP/s and HBM GB/s on this chip.

CAVEAT: over the tunneled backend every standalone harness has pitfalls
(per-call fetch = ~37 ms round-trip; multi-call = ~4 ms/dispatch floor;
in-program fori_loop chains = loop-carry overhead for non-square shapes).
The AUTHORITATIVE per-op rates are xprof's in-program model_flop_rate from
scripts/trace_*.py. v5e peak is ~197 TFLOP/s bf16; the fused MLP kernels
trace at ~183 TF/s (93%)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_chained(op, args, iters=16, warmup=2):
    """Device time per op with the op CHAINED `iters` times inside ONE
    program (a scalar data dependency stops hoisting). Host-side dispatch
    over the tunnel costs ~4 ms/call, so multi-call timing floors at that
    regardless of program length; per-call fetch floors at the ~37 ms round
    trip (8192^3 'ran' at 36 TF/s that way)."""

    def chained(*a):
        def body(i, carry):
            s, dep = carry
            # scalar dep defeats loop-invariant hoisting at the cost of ONE
            # elementwise add of the first operand per iteration
            out = op(*(a[0] + dep,) + a[1:])
            return out, out.reshape(-1)[0].astype(a[0].dtype) * 1e-30
        out, _ = jax.lax.fori_loop(
            0, iters, body, (op(*a), jnp.zeros((), a[0].dtype))
        )
        return out

    f = jax.jit(chained)
    for _ in range(warmup):
        out = f(*args)
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = f(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / (iters + 1)


def main():
    rng = np.random.default_rng(0)
    for M, K, N in [(8192, 8192, 8192), (4096, 1280, 5120), (4096, 5120, 1280)]:
        a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
        dt = timed_chained(
            lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            (a, b),
        )
        tf = 2 * M * K * N / dt / 1e12
        print(f"matmul {M}x{K}x{N}: {dt*1e3:.2f} ms = {tf:.1f} TFLOP/s")

    # memory bandwidth: elementwise add over 1 GB
    x = jnp.asarray(rng.standard_normal((512, 1024, 1024)), jnp.bfloat16)  # 1 GB
    # bandwidth probe chains OUTPUT->INPUT (same shape): pure op, no extra add
    def chained_ew(x):
        return jax.lax.fori_loop(0, 16, lambda i, s: s * 1.0001 + 0.5, x)

    few = jax.jit(chained_ew)
    out = few(x); float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = few(x); float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 16
    gbps = 2 * x.size * 2 / dt / 1e9
    print(f"elementwise 1GB: {dt*1e3:.2f} ms = {gbps:.0f} GB/s (r+w)")

    # dispatch overhead: trivial program, fetched per call (this one IS the
    # host round-trip measurement)
    y = jnp.zeros((8, 128), jnp.float32)
    h = jax.jit(lambda y: y + 1)
    for _ in range(3):
        float(jnp.sum(h(y)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(jnp.sum(h(y)))
    print(f"tiny program round-trip: {(time.perf_counter()-t0)/20*1e3:.2f} ms")


if __name__ == "__main__":
    main()
