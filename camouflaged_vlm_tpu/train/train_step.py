"""Jittable training step.

Functional equivalent of the reference's `optimize_parameters`
(`/root/reference/models/sam_maskdecoder_edge.py:456-460`) + the DDP loop
(`/root/reference/train_ovcos_maskdecoder_edge.py:183-238`), as ONE compiled
program: forward, loss, grad, masked-AdamW update. Data parallelism comes
from the batch's `data`-axis sharding; XLA inserts the gradient reductions
(correctly — unlike the reference, whose DDP wrapper is unwrapped before
training so its ranks never synchronise gradients; see SURVEY.md §5.8).

The loss metrics returned are already the global (mesh-wide) means, replacing
the reference's explicit `dist.all_gather` of per-rank losses.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .losses import segmentation_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_mode: str = "iou",
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """batch keys: inp (B,H,W,3), gt (B,H,W,1), clip_image (B,h,w,3),
    clip_mask (B,h,w,1), prefix, suffix, eot_indices, bank_features."""

    def loss_fn(params, batch):
        masks, edges = model.apply(
            params,
            batch["inp"],
            batch["clip_image"],
            batch["clip_mask"],
            batch["prefix"],
            batch["suffix"],
            batch["eot_indices"],
            batch["bank_features"],
        )
        total, parts = segmentation_loss(masks, edges, batch["gt"], loss_mode)
        return total, parts

    def train_step(state: TrainState, batch):
        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, **parts}
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt_state
            ),
            metrics,
        )

    return train_step
