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

    def encode_class_text_features(
        self,
        prefix: jnp.ndarray,          # (N, 1, W) class-split prompt prefix
        suffix: jnp.ndarray,          # (N, L-1-n_ctx, W)
        eot_indices: jnp.ndarray,     # (N,)
        bank_features: jnp.ndarray,   # (N, embed_dim) frozen text-feature bank
    ) -> jnp.ndarray:
        """Per-class text features: normalised learned features + frozen bank.

        Image-independent — at inference this runs ONCE per class split, not
        once per batch (the reference recomputes the whole text tower every
        image, `mapleAlphaCLIP.py:286`).
        """
        prompts, _, deep_text, _ = self.prompt_learner(prefix, suffix)
        text_features = self.text_encoder(prompts, eot_indices, deep_text)
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True
        )
        return text_features + bank_features.astype(jnp.float32)

    def classify(
        self,
        image: jnp.ndarray,           # (B, H, W, 3)
        alpha: jnp.ndarray,           # (B, H, W, 1)
        text_features: jnp.ndarray,   # (N, embed_dim) from encode_class_text_features
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        _, shared_ctx, _, deep_visual = self._visual_prompts()
        image_features = self.image_encoder(image, alpha, shared_ctx, deep_visual)
        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True
        )
        logits = jnp.exp(self.logit_scale) * image_features @ text_features.T
        pred = jnp.argmax(logits, axis=-1)
        picked_text = text_features[pred][:, None, :]  # (B, 1, D)
        return image_features[:, None, :], picked_text, pred, logits

    def _visual_prompts(self):
        """Visual-side MaPLe prompts (class-split independent)."""
        dummy = jnp.zeros(
            (1, 1, self.cfg.transformer_width), jnp.float32
        )
        _, shared_ctx, _, deep_visual = self.prompt_learner(dummy, dummy)
        return None, shared_ctx, None, deep_visual

    def __call__(
        self,
        image: jnp.ndarray,           # (B, H, W, 3)
        alpha: jnp.ndarray,           # (B, H, W, 1)
        prefix: jnp.ndarray,          # (N, 1, W) class-split prompt prefix
        suffix: jnp.ndarray,          # (N, L-1-n_ctx, W)
        eot_indices: jnp.ndarray,     # (N,)
        bank_features: jnp.ndarray,   # (N, embed_dim) frozen text-feature bank
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        text_features = self.encode_class_text_features(
            prefix, suffix, eot_indices, bank_features
        )
        return self.classify(image, alpha, text_features)
