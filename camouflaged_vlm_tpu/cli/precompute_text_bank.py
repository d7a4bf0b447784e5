"""Precompute frozen per-class text-feature banks.

Capability equivalent of the reference's prompt-bank trainer
(`/root/reference/cocotrainers/alphaCLIP.py:148-223`): for each class name,
embed N templated prompts with the PLAIN CLIP text encoder (no MaPLe
prompting), L2-normalise each, average, renormalise — producing the
(num_classes, 768) banks the cascade adds to its learned text features
(the shipped `{Train,Test}CamoPromptsTextFeaturesViTB-14-336.pth`).

Usage:
  python -m camouflaged_vlm_tpu.cli.precompute_text_bank \
      --clip-ckpt ViT-L-14-336px.pt --split test --out test_bank.npy
"""

from __future__ import annotations

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from ..data.ovcamo import TRAIN_CLASS_NAMES, TEST_CLASS_NAMES
from ..data.templates import TEMPLATE_SETS
from ..models.clip import AlphaClipConfig, ClipTextTower, tokenize
from ..io import load_openai_clip_state_dict
from ..io.convert import convert_openai_clip
from ..utils.logging import log


def encode_text_features(
    clip_cfg: AlphaClipConfig,
    text_params: dict,
    token_embedding: np.ndarray,
    classnames,
    templates,
    batch_size: int = 64,
) -> np.ndarray:
    """(num_classes, embed_dim) normalised mean template embeddings."""
    tower = ClipTextTower(clip_cfg)

    @jax.jit
    def encode(prompt_embeds, eot):
        # no deep prompts: plain CLIP encode_text semantics
        return tower.apply({"params": text_params}, prompt_embeds, eot, [])

    out = []
    for name in classnames:
        prompts = [t.format(name) for t in templates]
        tokens = tokenize(prompts, clip_cfg.context_length)
        embeds = jnp.asarray(token_embedding[tokens])
        eot = jnp.asarray(tokens.argmax(axis=-1).astype(np.int32))
        feats = np.asarray(encode(embeds, eot), np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        mean = feats.mean(axis=0)
        mean /= np.linalg.norm(mean)
        out.append(mean)
    return np.stack(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip-ckpt", required=True)
    p.add_argument("--split", default="test", choices=["train", "test"])
    p.add_argument("--templates", default="camoprompts", choices=sorted(TEMPLATE_SETS))
    p.add_argument("--classnames", default=None, help="comma-separated override")
    p.add_argument("--out", required=True, help=".npy output path")
    args = p.parse_args()

    clip_cfg = AlphaClipConfig.vit_l_14_336()
    sd = load_openai_clip_state_dict(args.clip_ckpt)
    tree, token_embedding, missing = convert_openai_clip(sd, clip_cfg)
    assert token_embedding is not None, "checkpoint lacks token_embedding.weight"
    text_params = tree["clip_model"]["text_encoder"]

    if args.classnames:
        names = args.classnames.split(",")
    else:
        names = TRAIN_CLASS_NAMES if args.split == "train" else TEST_CLASS_NAMES

    bank = encode_text_features(
        clip_cfg, text_params, token_embedding, names, TEMPLATE_SETS[args.templates]
    )
    np.save(args.out, bank)
    log(f"wrote {bank.shape} bank to {args.out}")


if __name__ == "__main__":
    main()
