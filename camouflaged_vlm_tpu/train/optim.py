"""Optimizer assembly: AdamW + cosine schedule + parameter freezing.

Mirrors the reference recipe (`/root/reference/configs/ovcos-sam-vit-h-maskdecoder-edge.yaml:88-100`,
`/root/reference/utils.py:111-141`, freeze rule
`/root/reference/train_ovcos_maskdecoder_edge.py:301-303` and the frozen CLIP
tower `/root/reference/models/sam_maskdecoder_edge.py:184-189`):

  * AdamW lr 2e-4, weight_decay 0.01 (torch AdamW's default — the
    reference builds `AdamW(params, lr=...)` with no explicit decay,
    `utils.py:111-117`) -> CosineAnnealingLR(T_max=20 epochs, eta_min=1e-7);
  * trainable: prompt_generator (inside the SAM encoder), mask decoder,
    CLIP->prompt projections, no_mask_embed;
  * frozen: SAM ViT weights, the whole Alpha-CLIP tower (incl. the MaPLe
    prompt learner, trained separately upstream), and pe_layer — its
    gaussian matrix is a torch BUFFER (`sam_maskdecoder_edge.py:85-88`), so
    `model.parameters()` never exposes it to the reference's optimizer.
    (SURVEY.md §3.4 lists pe_layer as trainable; the buffer registration
    shows it cannot be.)

Freezing is structural: train_step.partition_params splits the param tree
and only the trainable half reaches the optimizer (zero optimizer memory
for frozen weights; jax AD prunes their backward entirely).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Tuple

import jax
import optax

TRAINABLE_SUBTREES: Tuple[str, ...] = (
    "prompt_generator",
    "mask_decoder",
    "no_mask_embed",
    "visual_proj_ln1",
    "visual_proj_dense",
    "visual_proj_ln2",
    "text_proj_ln",
    "text_proj_dense",
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def trainable_mask(params, trainable_subtrees: Iterable[str] = TRAINABLE_SUBTREES):
    """Pytree of {'train' | 'freeze'} labels matching params' structure."""
    subtrees = tuple(trainable_subtrees)

    def label(path, _):
        p = _path_str(path)
        return "train" if any(s in p for s in subtrees) else "freeze"

    return jax.tree_util.tree_map_with_path(label, params)


def cosine_epoch_schedule(
    base_lr: float = 2e-4,
    total_epochs: int = 20,
    steps_per_epoch: int = 1,
    eta_min: float = 1e-7,
) -> Callable[[Any], Any]:
    """CosineAnnealingLR stepped per epoch (the reference steps the torch
    scheduler once per epoch, so lr is piecewise-constant within an epoch)."""
    import jax.numpy as jnp

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, total_epochs)
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * epoch / total_epochs)
        )

    return schedule


def make_optimizer(
    params=None,
    base_lr: float = 2e-4,
    weight_decay: float = 0.01,
    total_epochs: int = 20,
    steps_per_epoch: int = 1,
    eta_min: float = 1e-7,
) -> optax.GradientTransformation:
    """AdamW + per-epoch cosine. Freezing is handled structurally: the train
    step partitions params and only the trainable subtree reaches this
    optimizer (train_step.partition_params), so no masking wrapper is needed
    and frozen params take zero optimizer memory."""
    schedule = cosine_epoch_schedule(base_lr, total_epochs, steps_per_epoch, eta_min)
    return optax.adamw(schedule, weight_decay=weight_decay)
