"""Trained-weights A/B of the production numeric path (VERDICT round-2 #3).

Trains the tiny cascade ON-CHIP to a non-trivial loss (the production train
CLI on a synthetic OVCamo set), then evaluates the SAME checkpoint under

  A: the production configuration — attn_impl='flash' (compact layout +
     Pallas kernels), bfloat16, tanh GELU;
  B: the parity configuration — attn_impl='reference' (dense bias, padded
     windows), float32, exact erf GELU

and compares the OUTPUTS image by image: predicted classes must agree and
mask probabilities must match within bf16-accumulation tolerance. Closes
the gap between the per-kernel 1e-6 checks / CPU golden parity and the
configuration bench.py actually measures — a bf16-only kernel bug would
show up here. Reference semantics anchor:
`/root/reference/models/sam_maskdecoder_edge.py:331-357`.

Usage: python scripts/ab_trained_numeric.py   (on the TPU; ~15 min)
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp


def make_synth(root="/tmp/ab_synth"):
    import yaml
    from PIL import Image

    if os.path.exists(f"{root}/dataset_info.yaml"):
        return f"{root}/dataset_info.yaml"
    rng = np.random.default_rng(0)
    classes = [{"name": n, "split": s} for n, s in
               [("cat", "train"), ("owl", "train"), ("bat", "test"), ("slug", "test")]]
    samples = []
    for sp in ("train", "test"):
        os.makedirs(f"{root}/{sp}/image", exist_ok=True)
        os.makedirs(f"{root}/{sp}/mask", exist_ok=True)
    plan = [("cat", "train"), ("owl", "train")] * 4 + [("bat", "test"), ("slug", "test")] * 2
    for i, (n, sp) in enumerate(plan):
        uid = f"img{i}"
        h, w = 80 + 7 * i, 100 + 5 * i
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            f"{root}/{sp}/image/{uid}.jpg")
        Image.fromarray(((rng.random((h, w)) > 0.6) * 255).astype(np.uint8)).save(
            f"{root}/{sp}/mask/{uid}.png")
        samples.append({"unique_id": uid, "base_class": n,
                        "image": f"{uid}.jpg", "mask": f"{uid}.png"})
    os.makedirs(f"{root}/jsonfile", exist_ok=True)
    json.dump(classes, open(f"{root}/jsonfile/class_info.json", "w"))
    json.dump(samples, open(f"{root}/jsonfile/sample_info.json", "w"))
    info = {
        "OVCamo_CLASS_JSON_PATH": f"{root}/jsonfile/class_info.json",
        "OVCamo_SAMPLE_JSON_PATH": f"{root}/jsonfile/sample_info.json",
        "OVCamo_TR_IMAGE_DIR": f"{root}/train/image",
        "OVCamo_TR_MASK_DIR": f"{root}/train/mask",
        "OVCamo_TE_IMAGE_DIR": f"{root}/test/image",
        "OVCamo_TE_MASK_DIR": f"{root}/test/mask",
    }
    yaml.safe_dump(info, open(f"{root}/dataset_info.yaml", "w"))
    return f"{root}/dataset_info.yaml"


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    info = make_synth()
    save_dir = "/tmp/ab_train"
    if not os.path.isdir(f"{save_dir}/ckpt_last"):
        print("[ab] training tiny cascade on-chip...", flush=True)
        r = subprocess.run(
            [sys.executable, "-m", "camouflaged_vlm_tpu.cli.train",
             "--dataset-info", info, "--save-dir", save_dir, "--tiny",
             "--epochs", "3", "--batch-size", "4", "--epoch-val", "100",
             "--dtype", "bfloat16", "--seed", "1"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, "train failed"

    from camouflaged_vlm_tpu.data.loader import iter_eval_batches
    from camouflaged_vlm_tpu.data.ovcamo import OVCamoIndex
    from camouflaged_vlm_tpu.factory import build_tiny_cascade, make_bank_inputs
    from camouflaged_vlm_tpu.io.checkpoint import restore_train_params_host
    from camouflaged_vlm_tpu.models.cascade import OVCOSCascade
    import yaml

    params_np = restore_train_params_host(f"{save_dir}/ckpt_last")

    with open(info) as f:
        dataset_info = yaml.safe_load(f)
    te = OVCamoIndex.from_dataset_info(dataset_info, "test")

    model_a, cfg_a = build_tiny_cascade(dtype=jnp.bfloat16)  # production: flash+bf16+tanh
    cfg_b = _reference_cfg(cfg_a)
    model_b = OVCOSCascade(cfg_b)

    # same trained weights; compute dtype is set per-model by cfg
    cast = lambda dt: jax.tree.map(
        lambda p: jnp.asarray(p, dt) if np.asarray(p).ndim >= 2 else jnp.asarray(p),
        {"params": params_np["params"]} if "params" in params_np else params_np,
    )
    params_a = cast(jnp.bfloat16)
    params_b = cast(jnp.float32)

    bank = make_bank_inputs(cfg_a, te.classes, seed=1)
    args = (bank["prefix"], bank["suffix"], bank["eot_indices"], bank["bank_features"])

    fa = jax.jit(lambda p, *a: model_a.apply(p, *a, method=model_a.infer_cascade))
    fb = jax.jit(lambda p, *a: model_b.apply(p, *a, method=model_b.infer_cascade))

    n_img = agree = 0
    max_mae = 0.0
    for batch in iter_eval_batches(te, batch_size=2, inp_size=cfg_a.inp_size,
                                   clip_size=cfg_a.clip_size, num_workers=2):
        inp = jnp.asarray(np.stack([s.inp for s in batch]))
        cimg = jnp.asarray(np.stack([s.clip_image for s in batch]))
        cmask = jnp.asarray(np.stack([s.clip_mask for s in batch]))
        pa, ca, sa = fa(params_a, inp, cimg, cmask, *args)
        pb, cb, sb = fb(params_b, inp, cimg, cmask, *args)
        pa, pb = np.asarray(pa, np.float32), np.asarray(pb, np.float32)
        ca, cb = np.asarray(ca), np.asarray(cb)
        for j in range(len(batch)):
            n_img += 1
            agree += int(ca[j] == cb[j])
            max_mae = max(max_mae, float(np.abs(pa[j] - pb[j]).mean()))
    print(json.dumps({
        "ab_images": n_img,
        "class_argmax_agree": agree,
        "max_mask_mae_flash_bf16_vs_reference_fp32": round(max_mae, 5),
    }))
    ok = agree == n_img and max_mae < 0.02
    print("TRAINED A/B:", "PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


def _reference_cfg(cfg):
    enc = dataclasses.replace(
        cfg.encoder, attn_impl="reference", gelu_approximate=False,
        dtype=jnp.float32,
    )
    dec = dataclasses.replace(
        cfg.decoder, dtype=jnp.float32,
        transformer=dataclasses.replace(cfg.decoder.transformer, dtype=jnp.float32),
    )
    clip = dataclasses.replace(cfg.clip, dtype=jnp.float32, fused=False)
    return dataclasses.replace(cfg, encoder=enc, decoder=dec, clip=clip)


if __name__ == "__main__":
    main()
