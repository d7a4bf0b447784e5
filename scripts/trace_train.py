"""Trace the FULL-SIZE train step on TPU and print the op breakdown —
forward (fused Pallas kernels) vs backward (custom_vjp XLA formulations) vs
optimizer, to find where training time goes. Companion to
train_step_fullsize_tpu.py (which validates; this attributes)."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from camouflaged_vlm_tpu.models.cascade import CascadeConfig, OVCOSCascade
    from camouflaged_vlm_tpu.models.sam_encoder import SamEncoderConfig
    from camouflaged_vlm_tpu.factory import make_bank_inputs, init_cascade_params
    from camouflaged_vlm_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    B = 2
    base = CascadeConfig.full(dtype=jnp.bfloat16)
    cfg = CascadeConfig(
        inp_size=base.inp_size, clip_size=base.clip_size,
        prompt_embed_dim=base.prompt_embed_dim,
        encoder=SamEncoderConfig.vit_h(dtype=jnp.bfloat16, remat=True),
        decoder=base.decoder, clip=base.clip,
    )
    model = OVCOSCascade(cfg)
    bank = make_bank_inputs(cfg, ["cat", "owl", "snow leopard", "scorpionfish"])
    params = init_cascade_params(model, cfg, bank, batch=1)
    tx = make_optimizer(params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = {
        "inp": jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.float32),
        "gt": jnp.asarray((rng.random((B, 1024, 1024, 1)) > 0.5), jnp.float32),
        "clip_image": jnp.asarray(rng.standard_normal((B, 336, 336, 3)), jnp.float32),
        "clip_mask": jnp.full((B, 336, 336, 1), 1.923, jnp.float32),
        "prefix": jnp.asarray(bank["prefix"]),
        "suffix": jnp.asarray(bank["suffix"]),
        "eot_indices": jnp.asarray(bank["eot_indices"]),
        "bank_features": jnp.asarray(bank["bank_features"]),
    }

    state, metrics = step(state, batch)  # compile + warm
    float(metrics["loss"])

    logdir = "/tmp/jax-trace-train"
    jax.profiler.start_trace(logdir)
    for _ in range(2):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print("xplane files:", pbs, file=sys.stderr)
    if not pbs:
        print("NO TRACE CAPTURED")
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([pbs[-1]], "hlo_stats", {})
    out_path = "/tmp/trace_train_hlo_stats.out"
    with open(out_path, "wb" if isinstance(data, bytes) else "w") as fh:
        fh.write(data)
    print(f"wrote {out_path} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
