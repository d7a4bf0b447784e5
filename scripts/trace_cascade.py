"""Trace the FULL fused cascade program on TPU and print the op breakdown —
end-to-end attribution (encoder/clip/decoder/resize/glue) in one profile."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from camouflaged_vlm_tpu.factory import (
        build_full_cascade, make_bank_inputs, make_example_inputs,
        init_cascade_params,
    )
    from camouflaged_vlm_tpu.data.ovcamo import TEST_CLASS_NAMES

    B = 8
    dtype = jnp.bfloat16
    model, cfg = build_full_cascade(dtype=dtype)
    bank = make_bank_inputs(cfg, TEST_CLASS_NAMES)
    params = init_cascade_params(model, cfg, bank, batch=1)
    params = jax.tree.map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        params,
    )
    from camouflaged_vlm_tpu.factory import attach_rel_cache
    params = attach_rel_cache(params, cfg)
    inp, cimg, cmask = make_example_inputs(cfg, B)
    tf = jax.jit(
        lambda p, a, b, c, d: model.apply(
            p, a, b, c, d, method=model.encode_class_text_features
        )
    )(params, bank["prefix"], bank["suffix"], bank["eot_indices"], bank["bank_features"])

    @jax.jit
    def forward(params, inp, cimg, cmask, tf):
        probs, pred, score = model.apply(
            params, inp, cimg, cmask, tf, method=model.infer_cascade_with_text
        )
        return jnp.sum(probs.astype(jnp.float32)) + jnp.sum(pred) + jnp.sum(score)

    out = forward(params, inp, cimg, cmask, tf)
    float(out)

    logdir = "/tmp/jax-trace-cascade"
    jax.profiler.start_trace(logdir)
    outs = [forward(params, inp, cimg, cmask, tf) for _ in range(3)]
    float(outs[-1])
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print("xplane files:", pbs, file=sys.stderr)
    if not pbs:
        print("NO TRACE CAPTURED")
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    out_path = "/tmp/trace_cascade_hlo_stats.out"
    with open(out_path, "wb" if isinstance(data, bytes) else "w") as fh:
        fh.write(data)
    print(f"wrote {out_path} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
