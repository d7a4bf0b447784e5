"""Encoder-internal timing: one windowed block, one global block, patch
embed + EVP prompt stream + neck, at batch 8 bf16 on the real TPU."""



from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from camouflaged_vlm_tpu.models.sam_encoder import (
    Block,
    PromptGenerator,
    SamEncoderConfig,
)
from camouflaged_vlm_tpu.ops.fft_prompt import fft_highpass


def timed(fn, args, iters=6, warmup=2, name=""):
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:9.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--attn", default="flash")
    p.add_argument("--gelu-approx", action="store_true")
    args = p.parse_args()
    B = args.batch

    cfg = SamEncoderConfig.vit_h(
        dtype=jnp.bfloat16, attn_impl=args.attn,
        gelu_approximate=args.gelu_approx,
    )
    from camouflaged_vlm_tpu.ops.window import window_valid_mask

    rng = np.random.default_rng(0)
    win = cfg.window_size
    nwin = ((cfg.grid + win - 1) // win) ** 2
    xw = jnp.asarray(
        rng.standard_normal((B * nwin, win * win, cfg.embed_dim)), jnp.bfloat16
    )
    valid = window_valid_mask(cfg.grid, cfg.grid, win)
    key = jax.random.PRNGKey(0)

    wblock = Block(cfg, window_size=win, num_windows=nwin)
    wparams = jax.jit(wblock.init)(key, xw, valid)
    wp = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, wparams)
    t_w = timed(jax.jit(wblock.apply), (wp, xw, valid), name=f"windowed block ({args.attn})")

    xg = jnp.asarray(
        rng.standard_normal((B, cfg.grid * cfg.grid, cfg.embed_dim)), jnp.bfloat16
    )
    gblock = Block(cfg, window_size=0, attn_size=(cfg.grid, cfg.grid))
    gparams = jax.jit(gblock.init)(key, xg)
    gp = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, gparams)
    t_g = timed(jax.jit(gblock.apply), (gp, xg), name=f"global block ({args.attn})")

    img = jnp.asarray(
        rng.standard_normal((B, cfg.img_size, cfg.img_size, 3)), jnp.float32
    )
    t_fft = timed(
        jax.jit(lambda im: fft_highpass(im, cfg.freq_rate)), (img,), name="fft_highpass"
    )

    total = 28 * t_w + 4 * t_g + t_fft
    print(f"\nestimate: 28*wind + 4*glob + fft = {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
