"""Training losses for the cascade.

Re-derivations of the reference loss stack
(`/root/reference/models/sam_maskdecoder_edge.py:429-454`,
`/root/reference/models/iou_loss.py:8-21`,
`/root/reference/models/ovcamo_loss.py:18-34`,
`BBCEWithLogitLoss` at `sam_maskdecoder_edge.py:57-74`):

  total = BCEWithLogits(mask, gt) + softIoU(mask, gt)
        + dice(edge_pred, morphological_edge(gt))

All tensors are NHWC (B, H, W, 1); reductions run in fp32.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.pooling import morphological_edge


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1 + exp(-|x|)) + max(x, 0) - x*t, the numerically stable form.
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def balanced_bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Class-balanced BCE (reference `BBCEWithLogitLoss`): pos_weight =
    neg/pos, overall weight pos/(pos+neg)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    eps = 1e-10
    count_pos = jnp.sum(targets) + eps
    count_neg = jnp.sum(1.0 - targets)
    ratio = count_neg / count_pos
    w_neg = count_pos / (count_pos + count_neg)
    # BCEWithLogits with pos_weight r: loss = (1 + (r-1) t) * softplus term form
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    loss = -(ratio * targets * log_sig + (1.0 - targets) * log_one_minus)
    return w_neg * jnp.mean(loss)


def soft_iou_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """1 - soft IoU over spatial dims, averaged over batch/channels."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32))
    targets = targets.astype(jnp.float32)
    inter = jnp.sum(pred * targets, axis=(1, 2))
    union = jnp.sum(pred + targets, axis=(1, 2)) - inter
    return jnp.mean(1.0 - inter / union)


def soft_dice_loss(
    probs: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1.0, p: float = 2.0
) -> jnp.ndarray:
    """Per-sample flattened soft dice (reference `soft_dice_loss`)."""
    B = probs.shape[0]
    probs = probs.astype(jnp.float32).reshape(B, -1)
    targets = targets.astype(jnp.float32).reshape(B, -1)
    num = 2.0 * jnp.sum(probs * targets, axis=1) + smooth
    den = jnp.sum(probs ** p + targets ** p, axis=1) + smooth
    return jnp.mean(1.0 - num / den)


def edge_dice_loss(edge_probs: jnp.ndarray, edge_targets: jnp.ndarray) -> jnp.ndarray:
    """Dice loss on the (already sigmoided) edge prediction."""
    return soft_dice_loss(edge_probs, edge_targets)


def segmentation_loss(
    mask_logits: jnp.ndarray,
    edge_probs: jnp.ndarray,
    gt_mask: jnp.ndarray,
    loss_mode: str = "iou",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full reference loss: returns (total, {loss_mask, loss_edge})."""
    if loss_mode == "bce":
        loss_mask = bce_with_logits(mask_logits, gt_mask)
    elif loss_mode == "bbce":
        loss_mask = balanced_bce_with_logits(mask_logits, gt_mask)
    elif loss_mode == "iou":
        loss_mask = bce_with_logits(mask_logits, gt_mask) + soft_iou_loss(
            mask_logits, gt_mask
        )
    else:
        raise ValueError(f"unknown loss mode {loss_mode!r}")

    edge_gt = jax.lax.stop_gradient(morphological_edge(gt_mask.astype(jnp.float32), 5))
    loss_edge = edge_dice_loss(edge_probs, edge_gt)
    total = loss_mask + loss_edge
    return total, {"loss_mask": loss_mask, "loss_edge": loss_edge}
