"""Classification metrics as pure JAX functions.

Parity targets: sklearn.metrics accuracy_score / f1_score(average='weighted')
/ confusion_matrix, which the reference computes host-side per evaluation
(trainer.py:234-235,251). Implemented from a masked confusion matrix so they
run in-graph inside the vmapped fold sweep (no host round-trip per fold), with
sample masks supporting the padded/ragged per-fold datasets.
"""

from __future__ import annotations

import jax.numpy as jnp


def confusion_matrix(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    num_classes: int,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[num_classes, num_classes] counts; rows = true, cols = predicted."""
    if mask is None:
        mask = jnp.ones_like(y_true, dtype=jnp.float32)
    mask = mask.astype(jnp.float32)
    idx = y_true * num_classes + y_pred
    flat = jnp.zeros(num_classes * num_classes, jnp.float32).at[idx].add(mask)
    return flat.reshape(num_classes, num_classes)


def accuracy_from_cm(cm: jnp.ndarray) -> jnp.ndarray:
    total = cm.sum()
    return jnp.where(total > 0, jnp.trace(cm) / total, 0.0)


def weighted_f1_from_cm(cm: jnp.ndarray) -> jnp.ndarray:
    """Support-weighted mean of per-class F1 (sklearn average='weighted').

    Classes with zero support contribute nothing; classes with zero
    precision+recall get F1=0, matching sklearn's zero_division=0 default.
    """
    tp = jnp.diag(cm)
    support = cm.sum(axis=1)
    predicted = cm.sum(axis=0)
    precision = jnp.where(predicted > 0, tp / jnp.maximum(predicted, 1e-12), 0.0)
    recall = jnp.where(support > 0, tp / jnp.maximum(support, 1e-12), 0.0)
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2 * precision * recall / jnp.maximum(denom, 1e-12), 0.0)
    total = support.sum()
    return jnp.where(total > 0, (f1 * support).sum() / jnp.maximum(total, 1e-12), 0.0)


def accuracy(y_true, y_pred, num_classes: int, mask=None) -> jnp.ndarray:
    return accuracy_from_cm(confusion_matrix(y_true, y_pred, num_classes, mask))


def weighted_f1(y_true, y_pred, num_classes: int, mask=None) -> jnp.ndarray:
    return weighted_f1_from_cm(confusion_matrix(y_true, y_pred, num_classes, mask))
