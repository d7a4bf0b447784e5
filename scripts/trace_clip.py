"""Capture a jax.profiler trace of the CLIP classify pass on TPU and print
the op-level breakdown via xprof (same harness as trace_encoder.py).

Builds ONLY the CustomClip tower (the full-cascade init compile takes ~10 min
through the tunnel and is not needed here)."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from camouflaged_vlm_tpu.models.clip.custom_clip import CustomClip
    from camouflaged_vlm_tpu.models.clip.model import AlphaClipConfig

    B, N_CLASSES = 8, 61
    dtype = jnp.bfloat16
    cfg = AlphaClipConfig.vit_l_14_336(dtype=dtype)
    model = CustomClip(cfg)
    rng = np.random.default_rng(0)

    image = jnp.asarray(rng.standard_normal((B, 336, 336, 3)), jnp.float32)
    alpha = jnp.full((B, 336, 336, 1), (1.0 - 0.5) / 0.26, jnp.float32)
    L = cfg.context_length
    prefix = jnp.asarray(rng.standard_normal((N_CLASSES, 1, cfg.transformer_width)) * .02, jnp.float32)
    suffix = jnp.asarray(
        rng.standard_normal((N_CLASSES, L - 1 - cfg.n_ctx, cfg.transformer_width)) * .02,
        jnp.float32,
    )
    eot = jnp.full((N_CLASSES,), 9, jnp.int32)
    bank = jnp.asarray(rng.standard_normal((N_CLASSES, cfg.embed_dim)) * .1, jnp.float32)

    params = jax.jit(
        lambda k: model.init(k, image[:1], alpha[:1], prefix, suffix, eot, bank)
    )(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        params,
    )

    tf = jax.jit(
        lambda p, a, b, c, d: model.apply(
            p, a, b, c, d, method=model.encode_class_text_features
        )
    )(params, prefix, suffix, eot, bank)

    clipj = jax.jit(
        lambda p, img, msk, t: model.apply(p, img, msk, t, method=model.classify)
    )
    out = clipj(params, image, alpha, tf)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # warm

    import time
    t0 = time.perf_counter()
    outs = [clipj(params, image, alpha, tf) for _ in range(10)]
    float(jnp.sum(jax.tree.leaves(outs[-1])[0].astype(jnp.float32)))
    print(f"classify: {(time.perf_counter()-t0)/10*1e3:.2f} ms/pass (batch {B})")

    logdir = "/tmp/jax-trace-clip"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = clipj(params, image, alpha, tf)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print("xplane files:", pbs, file=sys.stderr)
    if not pbs:
        print("NO TRACE CAPTURED")
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    out_path = "/tmp/trace_clip_hlo_stats.out"
    with open(out_path, "wb" if isinstance(data, bytes) else "w") as fh:
        fh.write(data)
    print(f"wrote {out_path} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
