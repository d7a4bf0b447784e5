"""CustomCLIP: prompt learner + text tower + Alpha-CLIP vision tower.

Re-design of `CustomCLIP` (`/root/reference/cocotrainers/mapleAlphaCLIP.py:229-294`).
Classification head: normalised image features against
(normalised learned text features + frozen precomputed prompt-bank features),
scaled by exp(logit_scale). The returned per-prediction text feature is taken
*after* the bank addition without renormalisation, matching the reference
(`mapleAlphaCLIP.py:277-280,291-294`).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .model import AlphaClipConfig, AlphaClipVisionTower, ClipTextTower
from .prompt_learner import MultiModalPromptLearner, PromptLearnerConfig


class CustomClip(nn.Module):
    cfg: AlphaClipConfig

    def setup(self):
        cfg = self.cfg
        self.prompt_learner = MultiModalPromptLearner(
            PromptLearnerConfig(
                n_ctx=cfg.n_ctx,
                prompt_depth=cfg.prompt_depth,
                text_width=cfg.transformer_width,
                vision_width=cfg.vision_width,
                dtype=cfg.dtype,
            )
        )
        self.text_encoder = ClipTextTower(cfg)
        self.image_encoder = AlphaClipVisionTower(cfg)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.log(1.0 / 0.07), jnp.float32),
            (),
        )

    def __call__(
        self,
        image: jnp.ndarray,           # (B, H, W, 3)
        alpha: jnp.ndarray,           # (B, H, W, 1)
        prefix: jnp.ndarray,          # (N, 1, W) class-split prompt prefix
        suffix: jnp.ndarray,          # (N, L-1-n_ctx, W)
        eot_indices: jnp.ndarray,     # (N,)
        bank_features: jnp.ndarray,   # (N, embed_dim) frozen text-feature bank
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        prompts, shared_ctx, deep_text, deep_visual = self.prompt_learner(
            prefix, suffix
        )
        text_features = self.text_encoder(prompts, eot_indices, deep_text)
        image_features = self.image_encoder(image, alpha, shared_ctx, deep_visual)

        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True
        )
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True
        )
        text_features = text_features + bank_features.astype(jnp.float32)

        logits = jnp.exp(self.logit_scale) * image_features @ text_features.T
        pred = jnp.argmax(logits, axis=-1)
        picked_text = text_features[pred][:, None, :]  # (B, 1, D)
        return image_features[:, None, :], picked_text, pred, logits
