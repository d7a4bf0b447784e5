"""One FULL-SIZE train step on the real chip: forward + backward through all
fused Pallas kernels (custom_vjp -> XLA formulations) + masked AdamW.
Validates production-scale training memory and that the loss is finite and
decreases over a couple of steps.

Knobs: TRAIN_BATCH (default 2), TRAIN_REMAT (default 0 — matching
`CascadeConfig.full()`/cli.train's no-remat production mode; the kernels'
custom_vjps keep only inputs as residuals so no-remat is ~15% faster and
fits HBM up to batch 4), TRAIN_STEPS (default 3), TRAIN_ACCUM (default 1 —
gradient accumulation: TRAIN_BATCH is the GLOBAL batch, scanned as
TRAIN_ACCUM microbatches of TRAIN_BATCH/TRAIN_ACCUM; e.g. BATCH=8 ACCUM=2
trains effective batch 8 no-remat on one 16 GB chip)."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

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

    B = int(_os.environ.get("TRAIN_BATCH", "2"))
    remat = _os.environ.get("TRAIN_REMAT", "0") != "0"
    base = CascadeConfig.full(dtype=jnp.bfloat16)
    cfg = CascadeConfig(
        inp_size=base.inp_size, clip_size=base.clip_size,
        prompt_embed_dim=base.prompt_embed_dim,
        encoder=SamEncoderConfig.vit_h(dtype=jnp.bfloat16, remat=remat),
        decoder=base.decoder, clip=base.clip,
    )
    model = OVCOSCascade(cfg)
    from camouflaged_vlm_tpu.data.ovcamo import TEST_CLASS_NAMES

    n_cls = int(_os.environ.get("TRAIN_CLASSES", "4"))
    bank = make_bank_inputs(
        cfg, (TEST_CLASS_NAMES * 2)[:n_cls] if n_cls > 4
        else ["cat", "owl", "snow leopard", "scorpionfish"][:n_cls]
    )
    params = init_cascade_params(model, cfg, bank, batch=1)

    accum = int(_os.environ.get("TRAIN_ACCUM", "1"))
    assert B % max(accum, 1) == 0, (B, accum)
    tx = make_optimizer(params)
    # TRAIN_OPT=flat: ravel the trainable subtree into ONE vector around the
    # AdamW update (optax.flatten) — the round-4 trace attributed ~14 ms of
    # the accum-4x2 step to optimizer/dispatch across hundreds of small
    # per-leaf update chains; one fused vector update collapses them.
    if _os.environ.get("TRAIN_OPT", "tree") == "flat":
        import optax

        tx = optax.flatten(tx)
    state = create_train_state(params, tx)
    step = jax.jit(
        make_train_step(model, tx, accum_steps=accum), donate_argnums=(0,)
    )

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
    # TRAIN_TEXT=hoist: precomputed class-text features in the batch
    # (cli/train's production mode since the conditioning-quirk fix feeds
    # the 61-class TEST bank; the frozen text tower makes the hoist exact)
    if _os.environ.get("TRAIN_TEXT", "bank") == "hoist":
        tf = jax.jit(
            lambda p, a, b_, c, d: model.apply(
                p, a, b_, c, d, method=model.encode_class_text_features
            )
        )(params, batch["prefix"], batch["suffix"], batch["eot_indices"],
          batch["bank_features"])
        batch = {k: v for k, v in batch.items()
                 if k not in ("prefix", "suffix", "eot_indices", "bank_features")}
        batch["text_features"] = tf
    if accum > 1:
        for k in ("inp", "gt", "clip_image", "clip_mask"):
            x = batch[k]
            batch[k] = x.reshape((accum, B // accum) + x.shape[1:])

    n_steps = int(_os.environ.get("TRAIN_STEPS", "3"))
    losses = []
    t0 = time.perf_counter()
    times = []
    for i in range(n_steps):
        ts = time.perf_counter()
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])  # blocks
        times.append(time.perf_counter() - ts)
        losses.append(loss)
        print(f"step {i}: loss={loss:.4f} mask={float(metrics['loss_mask']):.4f} "
              f"edge={float(metrics['loss_edge']):.4f} "
              f"({time.perf_counter() - t0:.1f}s cum)")
    if n_steps > 3:
        steady = times[2:]
        print(f"steady-state step: {min(steady)*1e3:.0f} ms min / "
              f"{sum(steady)/len(steady)*1e3:.0f} ms mean over {len(steady)}")
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], ("loss did not decrease", losses)
    print(f"FULL-SIZE TRAIN STEP OK (batch {B}, remat={remat}, bf16): "
          f"losses {', '.join(f'{x:.4f}' for x in losses)}")


if __name__ == "__main__":
    main()
