"""Training checkpoint/resume (SURVEY.md §5 checkpoint subsystem).

The reference checkpoints model weights only (npy tree / Burn record); a
training framework needs full state (params + optimizer + step). Two backends:

  * orbax (`save_train_state`/`restore_train_state`): the idiomatic JAX
    checkpointer -- async-capable, handles arbitrary pytrees, restores with
    sharding when given an abstract target (multi-chip restore).
  * export_params: peel the params out of a TrainState into the standard
    inference formats (safetensors / npy tree) so a fine-tuned model drops
    straight into the transcribe pipeline.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from ..config import WhisperConfig
from ..io import checkpoint as ckpt_io
from .train import TrainState


def save_train_state(path: str, state: TrainState) -> None:
    """Synchronous orbax save of the full TrainState."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)


def restore_train_state(path: str, target: Optional[TrainState] = None) -> TrainState:
    """Restore a TrainState; `target` (a matching state, e.g. freshly
    initialized) provides structure/dtype/sharding for the restore."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restored = ckptr.restore(path, item=jax.device_get(target))
    else:
        restored = ckptr.restore(path)
    if not isinstance(restored, TrainState):
        restored = TrainState(*restored)
    return restored


def export_params(state: TrainState, cfg: WhisperConfig, path: str) -> None:
    """Write the trained params as an inference checkpoint (.safetensors)."""
    ckpt_io.save_safetensors(state.params, cfg, path)
