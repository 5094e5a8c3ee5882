"""Device mesh construction (SURVEY.md §5: the TPU-native replacement for a
distributed communication backend -- XLA collectives over ICI/DCN via
`jax.sharding.Mesh`, not NCCL/MPI; the reference is single-device,
src/bin/transcribe/main.rs:82).

Axis conventions:
  * "dp" -- data parallel: independent audio streams / training batch.
  * "tp" -- tensor parallel: attention heads + MLP hidden sharded per layer;
    collectives (psum on the row-parallel projections) ride ICI.

Whisper's sequence lengths are architecturally capped (1500 audio / 448 text
positions, src/model/mod.rs:134-139,236-241), so there is deliberately no
sequence/context-parallel axis -- scaling comes from batching streams (dp)
and, for large models, sharding heads/MLP (tp). See SURVEY.md §5.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh over the available devices.

    dp defaults to n_devices // tp. tp must divide the device count and, for
    balanced sharding, the model's head count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"tp={tp} must divide device count {n}")
    dp = dp if dp is not None else n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=[jax.devices()[0]])
