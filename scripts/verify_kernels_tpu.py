"""On-TPU kernel-vs-reference equivalence (VERDICT round-1 item #3).

Runs the full-size SAM ViT-H encoder and the Alpha-CLIP vision tower TWICE on
the real chip — once through the production Pallas path (attn_impl='flash',
bf16, fused MLP/attention kernels) and once through the pure-XLA reference
formulation (attn_impl='reference', fp32, exact erf GELU) — and asserts the
outputs agree within bf16 tolerance. This is the only place compiled-Mosaic
semantics (real grids/BlockSpecs, not interpret mode) are checked against the
dense-bias reference on production shapes.

Usage:  python scripts/verify_kernels_tpu.py [--batch 2]
Writes a PASS/FAIL summary suitable for PARITY.md.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    denom = np.maximum(np.abs(want), 1e-3)
    return float(np.max(np.abs(got - want) / denom)), float(
        np.mean(np.abs(got - want) / denom)
    )


def check_encoder(batch: int) -> bool:
    from camouflaged_vlm_tpu.models.sam_encoder import ImageEncoderViT, SamEncoderConfig

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 1024, 1024, 3)), jnp.float32)

    cfg_fast = SamEncoderConfig.vit_h(dtype=jnp.bfloat16, attn_impl="flash")
    cfg_ref = SamEncoderConfig.vit_h(
        dtype=jnp.float32, attn_impl="reference", gelu_approximate=False
    )
    enc_fast, enc_ref = ImageEncoderViT(cfg_fast), ImageEncoderViT(cfg_ref)

    params = jax.jit(enc_ref.init)(jax.random.PRNGKey(0), x)
    # randomise rel-pos tables (zero-init by default -> would not test the
    # bias path) and keep everything fp32 master
    flat = jax.tree_util.tree_leaves_with_path(params)
    seed = 1
    new = {}
    for path, leaf in flat:
        k = jax.tree_util.keystr(path)
        if "rel_pos" in k:
            r = np.random.default_rng(seed)
            seed += 1
            new[k] = jnp.asarray(
                r.standard_normal(leaf.shape).astype(np.float32) * 0.05
            )
    params = jax.tree_util.tree_map_with_path(
        lambda p, l: new.get(jax.tree_util.keystr(p), l), params
    )
    params_bf16 = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params
    )

    want = jax.jit(lambda p, x: enc_ref.apply(p, x))(params, x)
    got = jax.jit(lambda p, x: enc_fast.apply(p, x))(params_bf16, x)
    mx, mean = rel_err(got, want)
    ok = mx < 0.12 and mean < 5e-3  # bf16 kernels + tanh GELU vs fp32 erf
    print(f"encoder  flash-bf16 vs reference-fp32: max_rel={mx:.4f} "
          f"mean_rel={mean:.5f} -> {'PASS' if ok else 'FAIL'}")
    return ok


def check_clip(batch: int) -> bool:
    from camouflaged_vlm_tpu.models.clip.model import (
        AlphaClipConfig, AlphaClipVisionTower,
    )

    rng = np.random.default_rng(3)
    cfg_fast = AlphaClipConfig.vit_l_14_336(dtype=jnp.bfloat16)
    cfg_ref = AlphaClipConfig.vit_l_14_336(dtype=jnp.float32)
    fast, ref = AlphaClipVisionTower(cfg_fast), AlphaClipVisionTower(cfg_ref)

    image = jnp.asarray(rng.standard_normal((batch, 336, 336, 3)), jnp.float32)
    alpha = jnp.asarray(rng.standard_normal((batch, 336, 336, 1)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((cfg_ref.n_ctx, cfg_ref.vision_width)) * 0.02, jnp.float32)
    deep = [
        jnp.asarray(rng.standard_normal((cfg_ref.n_ctx, cfg_ref.vision_width)) * 0.02, jnp.float32)
        for _ in range(cfg_ref.prompt_depth - 1)
    ]
    params = jax.jit(ref.init)(jax.random.PRNGKey(1), image, alpha, sc, deep)
    params_bf16 = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params
    )
    want = jax.jit(lambda p, *a: ref.apply(p, *a))(params, image, alpha, sc, deep)
    got = jax.jit(lambda p, *a: fast.apply(p, *a))(params_bf16, image, alpha, sc, deep)
    mx, mean = rel_err(got, want)
    ok = mx < 0.12 and mean < 5e-3
    print(f"clip-vis flash-bf16 vs reference-fp32: max_rel={mx:.4f} "
          f"mean_rel={mean:.5f} -> {'PASS' if ok else 'FAIL'}")
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    args = p.parse_args()
    assert jax.default_backend() != "cpu", "run on the TPU"
    ok = check_encoder(args.batch) & check_clip(args.batch)
    print("KERNEL EQUIVALENCE:", "PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
