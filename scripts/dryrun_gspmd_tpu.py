"""GSPMD-wrapped Pallas on the real chip (VERDICT round-2 weak #3).

The CPU multichip dryrun validates the dp x tp SHARDING math on the XLA
fallback path (Pallas is gated off on CPU); this script runs the FULL-SIZE
train step under a jax.sharding Mesh of shape (data=1, model=1) on the one
physical chip — same `shard_params` / NamedSharding-annotated batch /
`with mesh:` machinery as cli/train.py, but with every compiled Mosaic
kernel engaged. Proves the GSPMD partitioner composes with the pallas_call
custom-calls (sharding propagation through custom_vjp included); the
only thing it cannot prove on this hardware is >1-chip partitioning of the
kernels' grids, which PARITY.md scopes explicitly.

Usage: python scripts/dryrun_gspmd_tpu.py   (~10 min incl. compile)
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    from camouflaged_vlm_tpu.models.cascade import CascadeConfig, OVCOSCascade
    from camouflaged_vlm_tpu.models.sam_encoder import SamEncoderConfig
    from camouflaged_vlm_tpu.factory import make_bank_inputs, init_cascade_params
    from camouflaged_vlm_tpu.parallel import make_mesh, shard_params
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

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    params = shard_params(mesh, params)
    tx = make_optimizer(params)
    state = create_train_state(params, tx)
    # donate_argnums: without donation the step holds old+new copies of
    # params+optimizer, which RESOURCE_EXHAUSTs the chip on step 1.
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    batch_shard = NamedSharding(mesh, P("data", None, None, None))
    repl = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)
    batch = {
        "inp": jax.device_put(
            rng.standard_normal((B, 1024, 1024, 3)).astype(np.float32), batch_shard
        ),
        "gt": jax.device_put(
            (rng.random((B, 1024, 1024, 1)) > 0.5).astype(np.float32), batch_shard
        ),
        "clip_image": jax.device_put(
            rng.standard_normal((B, 336, 336, 3)).astype(np.float32), batch_shard
        ),
        "clip_mask": jax.device_put(
            np.full((B, 336, 336, 1), 1.923, np.float32), batch_shard
        ),
        "prefix": jax.device_put(np.asarray(bank["prefix"]), repl),
        "suffix": jax.device_put(np.asarray(bank["suffix"]), repl),
        "eot_indices": jax.device_put(np.asarray(bank["eot_indices"]), repl),
        "bank_features": jax.device_put(np.asarray(bank["bank_features"]), repl),
    }

    losses = []
    with mesh:
        t0 = time.perf_counter()
        for i in range(3):
            state, metrics = step(state, batch)
            loss = float(metrics["loss"])
            losses.append(loss)
            print(
                f"step {i}: loss={loss:.4f} "
                f"({time.perf_counter() - t0:.1f}s elapsed)", flush=True,
            )
    ok = all(np.isfinite(losses)) and losses[-1] < losses[0]
    print(
        f"GSPMD-on-chip dryrun: mesh=(1,1), Pallas kernels engaged, "
        f"losses={['%.4f' % l for l in losses]} -> {'PASS' if ok else 'FAIL'}"
    )
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
