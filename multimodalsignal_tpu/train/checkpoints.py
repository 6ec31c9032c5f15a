"""Checkpointing: full-train-state save/restore.

The reference persists only model weights on improvement
(trainer.py:38-39, `best_model.pt`) — no optimizer state, no mid-run resume
(SURVEY.md §5). Here a checkpoint is the complete pytree (params, batch_stats,
opt_state, and optionally scheduler/early-stop/epoch state), serialized with
flax's msgpack codec, so training can resume exactly. Orbax is available in
the environment but msgpack keeps single-file fold checkpoints trivially
portable; the format is an implementation detail behind save/restore.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
from flax import serialization


def save_state(path: Path | str, state: Any) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # Pull to host before serializing (works for sharded arrays too).
    host_state = jax.tree_util.tree_map(lambda a: jax.device_get(a), state)
    path.write_bytes(serialization.to_bytes(host_state))


def restore_state(path: Path | str, target: Any) -> Any:
    """Restore into a template pytree of the same structure (e.g. a freshly
    initialized TrainState)."""
    return serialization.from_bytes(target, Path(path).read_bytes())
