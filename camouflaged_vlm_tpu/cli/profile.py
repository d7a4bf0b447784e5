"""Profiling CLI: per-stage wall times + jax.profiler trace + op breakdown.

The reference has no profiling subsystem (SURVEY.md §5.1 — only a wall-clock
Timer). Here: `--stages` times encoder / CLIP / decoder / fused cascade
separately; `--trace` captures a jax.profiler trace and prints the HLO
op-category breakdown via xprof (no TensorBoard needed); plain run prints
end-to-end latency. All timings use the host-fetch completion barrier (on
tunneled backends `block_until_ready` returns early; a scalar fetch is the
only reliable sync — see bench.py).
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import time

import numpy as np


def _timed(fn, args, iters, warmup, name=""):
    import jax
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1e3:9.2f} ms")
    return dt


def print_hlo_breakdown(logdir: str, top: int = 15) -> None:
    """Parse the xplane capture with xprof and print op-category self-times."""
    pbs = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not pbs:
        print("no xplane capture found under", logdir)
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    ix = {c: i for i, c in enumerate(cols)}
    rows = [[c.get("v") for c in r["c"]] for r in d["rows"]]
    agg = collections.Counter()
    total = 0.0
    for r in rows:
        t = float(r[ix["total_self_time"]] or 0)
        agg[r[ix["category"]]] += t
        total += t
    print(f"total device self time: {total/1e3:.1f} ms (all traced iterations)")
    for cat, t in agg.most_common(top):
        print(f"  {cat:32s} {t/1e3:9.1f} ms ({100*t/total:.1f}%)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--stages", action="store_true", help="time each stage")
    p.add_argument("--trace", action="store_true", help="capture a jax.profiler trace")
    p.add_argument("--trace-dir", default="/tmp/camouflaged-vlm-trace")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..factory import (
        build_full_cascade,
        build_tiny_cascade,
        init_cascade_params,
        make_bank_inputs,
        make_example_inputs,
    )
    from ..data.ovcamo import TEST_CLASS_NAMES

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, cfg = (build_tiny_cascade if args.tiny else build_full_cascade)(dtype=dtype)
    bank = make_bank_inputs(cfg, TEST_CLASS_NAMES)
    params = init_cascade_params(model, cfg, bank, batch=1)
    params = jax.tree.map(
        lambda q: q.astype(dtype) if q.dtype == jnp.float32 and q.ndim >= 2 else q,
        params,
    )
    text_features = jax.jit(
        lambda p, a, b, c, d: model.apply(
            p, a, b, c, d, method=model.encode_class_text_features
        )
    )(params, bank["prefix"], bank["suffix"], bank["eot_indices"], bank["bank_features"])
    inp, cimg, cmask = make_example_inputs(cfg, args.batch)

    full = jax.jit(
        lambda p, a, b, c, tf: model.apply(
            p, a, b, c, tf, method=model.infer_cascade_with_text
        )
    )

    if args.stages:
        enc = jax.jit(
            lambda p, x: model.apply(
                p, x, True, method=lambda m, x_, i_: m.image_encoder(x_, i_)
            )
        )
        _timed(enc, (params, inp), args.iters, args.warmup, "sam encoder")
        clip = jax.jit(
            lambda p, i, a, t: model.apply(
                p, i, a, t, method=lambda m, i_, a_, t_: m.clip_model.classify(i_, a_, t_)
            )
        )
        _timed(clip, (params, cimg, cmask, text_features), args.iters, args.warmup,
               "clip classify (1 pass)")

    if args.trace:
        out = full(params, inp, cimg, cmask, text_features)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.iters):
            out = full(params, inp, cimg, cmask, text_features)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace_dir}")
        print_hlo_breakdown(args.trace_dir)
    else:
        dt = _timed(full, (params, inp, cimg, cmask, text_features),
                    args.iters, args.warmup, "FULL fused cascade")
        print(f"throughput: {args.batch/dt:.2f} img/s (incl. per-call dispatch)")


if __name__ == "__main__":
    main()
