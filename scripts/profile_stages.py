"""Per-stage timing of the full cascade on the real TPU (batch 8, bf16).

Times each sub-program separately (encoder / clip classify / decoder+resize /
fused cascade) with the host-fetch checksum barrier from bench.py.
"""



from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from camouflaged_vlm_tpu.factory import (
    build_full_cascade,
    make_bank_inputs,
    make_example_inputs,
    init_cascade_params,
)
from camouflaged_vlm_tpu.data.ovcamo import TEST_CLASS_NAMES


def timed(fn, args, iters=6, warmup=2, name=""):
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()
    B = args.batch

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

    text_features = jax.jit(
        lambda p, a, b, c, d: model.apply(
            p, a, b, c, d, method=model.encode_class_text_features
        )
    )(params, bank["prefix"], bank["suffix"], bank["eot_indices"], bank["bank_features"])

    enc = jax.jit(
        lambda p, x: model.apply(p, x, True, method=lambda m, x_, i_: m.image_encoder(x_, i_))
    )
    t_enc = timed(enc, (params, inp), name="sam encoder (interm=True)")

    def clip_fn(p, img, msk, tf):
        return model.apply(
            p,
            img,
            msk,
            tf,
            method=lambda m, i, a, t: m.clip_model.classify(i, a, t),
        )

    clipj = jax.jit(clip_fn)
    t_clip = timed(clipj, (params, cimg, cmask, text_features), name="clip classify (1 pass)")

    # decoder + resize, with fixed dummy features
    g = cfg.embedding_size
    feats = jnp.zeros((B, g, g, 256), dtype)
    interm = [jnp.zeros((B, g, g, cfg.encoder.embed_dim), dtype) for _ in range(4)]
    sparse = jnp.zeros((B, 2, 256), dtype)

    def dec_fn(p, f, i0, i1, i2, i3, s):
        return model.apply(
            p, f, [i0, i1, i2, i3], s,
            method=lambda m, f_, i_, s_: m._decode(f_, i_, s_),
        )

    decj = jax.jit(dec_fn)
    t_dec = timed(decj, (params, feats, *interm, sparse), name="decoder + upsample")

    full = jax.jit(
        lambda p, a, b, c, tf: model.apply(
            p, a, b, c, tf, method=model.infer_cascade_with_text
        )
    )
    t_full = timed(full, (params, inp, cimg, cmask, text_features), name="FULL fused cascade")

    print()
    sum_parts = t_enc + 2 * t_clip + t_dec
    print(f"encoder {t_enc/t_full*100:.0f}%  clip×2 {2*t_clip/t_full*100:.0f}%  "
          f"decoder {t_dec/t_full*100:.0f}%  (parts sum {sum_parts*1e3:.1f} ms vs full {t_full*1e3:.1f} ms)")
    print(f"imgs/sec full: {B/t_full:.2f}")


if __name__ == "__main__":
    main()
