"""On-device vectorized training losses.

Replaces the reference's loss computation (`gnn/trainer.py:89-106,188-225` in
/root/reference) — notably the per-node Python loop over non-background nodes
for the Huber box loss (`trainer.py:193-206`) — with fully masked vector code:

  * weighted cross entropy with torch semantics: mean weighted by per-class
    weights, Σ w[yᵢ]·nll_i / Σ w[yᵢ] over valid nodes,
  * Huber (delta=1) box loss: mean over box dims per node, averaged over
    valid non-background nodes; NaN boxes are excluded (the reference instead
    drops the whole batch on its rare NaN bug, `trainer.py:208-220`),
  * total = α·cls + β·bb (`trainer.py:223-225`),
  * the orientation-angle adaption sin-encode/decode
    (`preprocessor/bounding_box.py:536-589`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights: jnp.ndarray,
                           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch.nn.CrossEntropyLoss(weight=w) parity over valid nodes.

    logits [N, C], labels [N] int, class_weights [C], mask [N] bool.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = class_weights[labels]
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)


def _huber(x: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    absx = jnp.abs(x)
    return jnp.where(absx < delta, 0.5 * x * x, delta * (absx - 0.5 * delta))


def masked_huber_box_loss(bb_pred: jnp.ndarray, bb_true: jnp.ndarray,
                          labels: jnp.ndarray, bg_index: int,
                          mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Huber loss over non-background valid nodes; NaN-target nodes excluded.

    bb_pred/bb_true [N, B]; returns a scalar: mean over box dims per node,
    then mean over contributing nodes (0 if none).
    """
    is_fg = labels != bg_index
    finite = jnp.all(jnp.isfinite(bb_true), axis=-1)
    sel = is_fg & finite
    if mask is not None:
        sel = sel & mask

    diff = jnp.where(sel[:, None], bb_true - bb_pred, 0.0)
    # guard: NaN targets already zeroed by sel, but 0*NaN = NaN — re-where.
    diff = jnp.where(jnp.isfinite(diff), diff, 0.0)
    per_node = jnp.mean(_huber(diff), axis=-1)
    num = jnp.sum(sel)
    return jnp.where(num > 0, jnp.sum(jnp.where(sel, per_node, 0.0))
                     / jnp.maximum(num, 1), 0.0)


def detection_loss(logits, bb_pred, labels, bb_true, class_weights, bg_index,
                   cls_loss_weight: float, bb_loss_weight: float,
                   node_mask: Optional[jnp.ndarray] = None):
    """Total loss α·L_cls + β·L_bb; returns (total, cls, bb) scalars."""
    l_cls = weighted_cross_entropy(logits, labels, class_weights, node_mask)
    l_bb = masked_huber_box_loss(bb_pred, bb_true, labels, bg_index, node_mask)
    return cls_loss_weight * l_cls + bb_loss_weight * l_bb, l_cls, l_bb


def adapt_bb_orientation_angle(boxes: jnp.ndarray) -> jnp.ndarray:
    """Map rotated-box θ from [0, π] to sin-encoded [-1, 1].

    Parity: `preprocessor/bounding_box.py:536-563` — angles above π/2 are
    flipped by -π, then sin. NaN rows pass through unchanged. Works for
    [..., 5] box arrays (no-op columns 0-3).
    """
    boxes = jnp.asarray(boxes)
    theta = boxes[..., 4]
    shifted = jnp.where(theta > jnp.pi / 2, theta - jnp.pi, theta)
    smooth = jnp.sin(shifted)
    out_theta = jnp.where(jnp.isnan(boxes[..., 0]), theta, smooth)
    return jnp.concatenate([boxes[..., :4], out_theta[..., None]], axis=-1)


def invert_bb_orientation_angle_adaption(theta):
    """Inverse of the sin-encoding: [-1,1] → [0, π] rad.

    Parity: `preprocessor/bounding_box.py:566-589`. Scalar or array.
    """
    theta = jnp.clip(theta, -1.0, 1.0)
    unsmoothed = jnp.arcsin(theta)
    return jnp.where(unsmoothed < 0, unsmoothed + jnp.pi, unsmoothed)
