"""FULL-SIZE cross-framework activation A/B (CPU, fp32, random weights).

Every golden-parity test runs tiny configs; the only full-size evidence so
far is the checkpoint key/shape census. This drives the PRODUCTION
configuration — SAM ViT-H @1024 (32 blocks, window 14, globals {7,15,23,31})
+ Alpha-CLIP ViT-L/14@336 (24 layers, MaPLe n_ctx=4 depth 9) — through the
reference's own torch modules AND our cascade with identical randomised
weights, and reports stage-1 mask and stage-2 logit agreement. Catches any
full-size-only wiring bug (window/global indices, 1024-token rel tables,
prompt-depth splice points) that tiny shapes cannot.

Both sides fp32 on CPU; our encoder uses attn_impl='reference' + exact GELU
(the bit-faithful parity mode — the fused kernels' equivalence to that
formulation is pinned separately by verify_kernels_tpu.py on-chip).

Runtime: ~15-40 min on this 1-core host (two ~6-TF forwards + a 1B-param
conversion). Memory ~20 GB peak (host has 125 GB).

Usage: python scripts/ab_fullsize_cpu.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "tests"
))

import time

import numpy as np
import torch

import jax

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize workaround

import dataclasses

import jax.numpy as jnp

from camouflaged_vlm_tpu.models.cascade import CascadeConfig, OVCOSCascade
from camouflaged_vlm_tpu.io.convert import (
    cascade_key_map, convert_state_dict, merge_into_params,
)
from camouflaged_vlm_tpu.data.transforms import ONES_ALPHA_VALUE

from _reference_oracle import (
    load_ref_cascade_module, load_ref_clip_model, load_ref_maple, maple_cfg,
    randomize_torch_module,
)

CLASSES = ["cat", "owl", "bat", "slug", "scorpionfish"]


def build_torch_full(test_bank):
    t0 = time.time()
    mod = load_ref_cascade_module(torch.zeros(3, 768), test_bank)
    SAM = mod._registry["sam_maskdecoder_edge"]
    encoder_mode = dict(
        embed_dim=1280, patch_size=16, depth=32, num_heads=16,
        mlp_ratio=4.0, out_chans=256, qkv_bias=True, use_rel_pos=True,
        window_size=14, global_attn_indexes=(7, 15, 23, 31),
        prompt_embed_dim=256,
    )
    orig_load = torch.load
    torch.load = mod._bank_loader
    try:
        tsam = SAM(inp_size=1024, encoder_mode=encoder_mode, loss="iou")
    finally:
        torch.load = orig_load
    randomize_torch_module(tsam, seed=3)
    with torch.no_grad():
        for mlp in tsam.mask_decoder.output_hypernetworks_mlps:
            mlp.layers[-1].weight *= 300.0
            mlp.layers[-1].bias *= 300.0

    ref_model = load_ref_clip_model()
    maple = load_ref_maple()
    design = {
        "trainer": "MaPLe", "vision_depth": 0, "language_depth": 0,
        "vision_ctx": 0, "language_ctx": 0, "maple_length": 4,
    }
    clip = ref_model.CLIP(
        embed_dim=768, image_resolution=336, vision_layers=24,
        vision_width=1024, vision_patch_size=14, context_length=77,
        vocab_size=49408, transformer_width=768, transformer_heads=12,
        transformer_layers=12, design_details=design,
    ).float()
    randomize_torch_module(clip, seed=4)
    cfg_m = maple_cfg(n_ctx=4, prompt_depth=9, imsize=336)
    tcc = maple.CustomCLIP(cfg_m, CLASSES[:3], CLASSES, clip).float().eval()
    randomize_torch_module(tcc.prompt_learner, seed=5)
    with torch.no_grad():
        emb = clip.token_embedding(tcc.prompt_learner.tokenized_prompts)
        tcc.prompt_learner.token_prefix.copy_(emb[:, :1, :])
        tcc.prompt_learner.token_suffix.copy_(emb[:, 1 + 4:, :])
        emb_t = clip.token_embedding(tcc.prompt_learner.tokenized_prompts_test)
        tcc.prompt_learner.token_prefix_test.copy_(emb_t[:, :1, :])
        tcc.prompt_learner.token_suffix_test.copy_(emb_t[:, 1 + 4:, :])
    tsam.load_mapleAlphaCLIP(tcc)
    tsam.eval()
    print(f"[torch] built + randomised in {time.time() - t0:.1f}s", flush=True)
    return tsam, tcc


def main():
    rng = np.random.default_rng(0)
    test_bank = torch.from_numpy(
        rng.standard_normal((len(CLASSES), 768)).astype(np.float32) * 0.1
    )
    tsam, tcc = build_torch_full(test_bank)

    base = CascadeConfig.full(dtype=jnp.float32)
    cfg = dataclasses.replace(
        base,
        encoder=dataclasses.replace(
            base.encoder, attn_impl="reference", gelu_approximate=False
        ),
    )
    model = OVCOSCascade(cfg)

    bank = {
        "prefix": jnp.asarray(tcc.prompt_learner.token_prefix_test.numpy()),
        "suffix": jnp.asarray(tcc.prompt_learner.token_suffix_test.numpy()),
        "eot_indices": jnp.asarray(
            tcc.prompt_learner.tokenized_prompts_test.argmax(dim=-1)
            .numpy().astype(np.int32)
        ),
        "bank_features": jnp.asarray(test_bank.numpy()),
    }

    inp = rng.standard_normal((1, 1024, 1024, 3)).astype(np.float32)
    cimg = rng.standard_normal((1, 336, 336, 3)).astype(np.float32)
    cmask = np.full((1, 336, 336, 1), ONES_ALPHA_VALUE, np.float32)
    args = (
        jnp.asarray(inp), jnp.asarray(cimg), jnp.asarray(cmask),
        bank["prefix"], bank["suffix"], bank["eot_indices"], bank["bank_features"],
    )

    t0 = time.time()
    params = jax.eval_shape(
        lambda *a: model.init(jax.random.PRNGKey(0), *a, method=model.infer_test),
        *args,
    )
    # eval_shape gives the tree structure without paying a full random init;
    # fill it from the converted torch weights (which cover every param —
    # pinned by tests/test_convert.py::test_key_map_covers_every_param).
    sd = {k: v.detach().numpy() for k, v in tsam.state_dict().items()}
    tree, missing, unused = convert_state_dict(sd, cascade_key_map(cfg))
    assert not missing, f"unconverted params: {missing[:5]} (+{len(missing)-5})"
    params = merge_into_params(
        jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params), tree
    )
    print(f"[ours] converted 1B-param state dict in {time.time() - t0:.1f}s", flush=True)

    # --- reference forward ---
    t0 = time.time()
    with torch.no_grad():
        want_mask = tsam.infer_test(
            torch.from_numpy(np.moveaxis(inp, 3, 1).copy()),
            torch.from_numpy(np.moveaxis(cimg, 3, 1).copy()),
            torch.from_numpy(np.moveaxis(cmask, 3, 1).copy()),
        )
        want_prob = torch.sigmoid(want_mask)
        alpha = torch.nn.functional.interpolate(
            want_prob, (336, 336), mode="bilinear", align_corners=False
        )
        _, _, want_pred, want_score = tsam.clip_model(
            torch.from_numpy(np.moveaxis(cimg, 3, 1).copy()), alpha, train=False
        )
    print(f"[torch] full-size forward in {time.time() - t0:.1f}s", flush=True)

    # --- our forward (one fused program) ---
    t0 = time.time()
    got_mask = model.apply(params, *args, method=model.infer_test)
    probs, pred, score = model.apply(params, *args, method=model.infer_cascade)
    print(f"[ours] full-size forward in {time.time() - t0:.1f}s", flush=True)

    gm = np.moveaxis(np.asarray(got_mask), 3, 1)
    wm = want_mask.numpy()
    scale = np.abs(wm).max()
    print(f"stage-1 mask logits: mae={np.abs(gm - wm).mean():.3e} "
          f"max={np.abs(gm - wm).max():.3e} (logit scale {scale:.2f})", flush=True)
    gp = np.asarray(probs)[0, :, :, 0]
    wp = want_prob.numpy()[0, 0]
    print(f"stage-1 sigmoid prob: mae={np.abs(gp - wp).mean():.3e} "
          f"max={np.abs(gp - wp).max():.3e} "
          f"(prob range [{wp.min():.3f}, {wp.max():.3f}])", flush=True)
    gs = np.asarray(score)[0]
    ws = want_score.numpy()[0]
    print(f"stage-2 logits: mae={np.abs(gs - ws).mean():.3e} "
          f"max={np.abs(gs - ws).max():.3e}; "
          f"argmax ours={int(np.asarray(pred)[0])} ref={int(want_pred)}", flush=True)
    ok = (
        np.abs(gp - wp).max() < 5e-3
        and int(np.asarray(pred)[0]) == int(want_pred)
    )
    print("FULL-SIZE A/B:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
