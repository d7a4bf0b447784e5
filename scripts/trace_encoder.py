"""Capture a jax.profiler trace of the SAM encoder on TPU and print the
op-level time breakdown via xprof (no TensorBoard UI needed)."""



from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from camouflaged_vlm_tpu.models.sam_encoder import ImageEncoderViT, SamEncoderConfig

    B = 8
    cfg = SamEncoderConfig.vit_h(dtype=jnp.bfloat16)
    enc = ImageEncoderViT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    params = jax.jit(enc.init)(key, x)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params
    )
    f = jax.jit(lambda p, x: enc.apply(p, x))
    out = f(params, x)
    float(jnp.sum(out.astype(jnp.float32)))  # warm

    logdir = "/tmp/jax-trace-enc"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = f(params, x)
        float(jnp.sum(out.astype(jnp.float32)))
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print("xplane files:", pbs, file=sys.stderr)
    if not pbs:
        print("NO TRACE CAPTURED")
        return
    from xprof.convert import raw_to_tool_data as rtd

    with open(pbs[-1], "rb") as fh:
        raw = fh.read()
    names = rtd.xspace_to_tool_names([pbs[-1]])
    print("tools:", names, file=sys.stderr)
    for tool in ("hlo_stats", "op_profile", "framework_op_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([pbs[-1]], tool, {})
            out_path = f"/tmp/trace_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out_path, mode) as fh:
                fh.write(data)
            print(f"wrote {out_path} ({len(data)} bytes)")
        except Exception as e:
            print(f"{tool}: FAILED {e}")


if __name__ == "__main__":
    main()
