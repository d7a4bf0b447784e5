"""Probe: does JAX's persistent compilation cache work over the axon tunnel?

If the axon PJRT client supports executable serialization, setting
`jax_compilation_cache_dir` makes the SECOND process-level run of the same
program skip the multi-minute remote compile — which would cut bench.py's
4-subprocess sweep (each currently recompiling from scratch) down to one
compile per program shape, and make driver/bench retries cheap.

Run twice on the real chip and compare the reported compile time:
    python scripts/probe_compile_cache.py

RESULT (2026-08-18, axon-tunneled v5e): NEGATIVE. The cache directory gets
an entry, but the second process still pays the full remote compile at
first execution (run 1: compile() 0.6s + 121s first-run; run 2 WITH a
populated cache: 2.4s + 179s first-run). On this backend `compile()`
returns before the server-side compile happens, and the serialized cache
entry does not short-circuit it — bench.py's per-subprocess compile cost
cannot be amortised this way.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

CACHE_DIR = "/tmp/jax_compile_cache_probe"

jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    # A distinctive program big enough to take measurable compile time:
    # a 12-layer toy MLP tower with fixed shapes.
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 1024)), jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((1024, 1024)) * 0.02, jnp.bfloat16)
          for _ in range(12)]

    @jax.jit
    def tower(x, ws):
        for w in ws:
            x = jnp.tanh(x @ w) + x
        return jnp.sum(x.astype(jnp.float32))

    t0 = time.perf_counter()
    lowered = tower.lower(x, ws)
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    val = float(compiled(x, ws))
    t_run = time.perf_counter() - t0
    print(f"compile: {t_compile:.2f}s  first-run: {t_run:.2f}s  val={val:.3f}")
    entries = []
    for root, _, files in _os.walk(CACHE_DIR):
        entries += files
    print(f"cache entries under {CACHE_DIR}: {len(entries)}")


if __name__ == "__main__":
    main()
