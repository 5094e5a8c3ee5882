"""Trace-time mesh context: lets the Pallas kernels run multi-chip.

GSPMD treats a `pallas_call` as an opaque custom call it cannot partition:
feeding mesh-sharded operands into one forces an all-gather of the operands
and a replicated kernel launch on every device -- on a tensor-parallel mesh
that throws away both the sharding and the kernel. The TPU-native
composition is `jax.shard_map`: the kernel entry points (ops/pallas/*)
consult this context at TRACE time and, when a mesh is active, wrap their
implementation in a shard_map whose specs shard the batch axis over "dp"
and the head/channel axis over "tp". Each device then runs the SAME kernel
on its local shard: attention never mixes heads, and the Megatron sharding
(parallel/sharding.py) keeps whole heads per "tp" shard, so the per-shard
kernel is simply the full kernel at n_head/tp heads. No collectives run
inside the kernels; GSPMD inserts the row-parallel psum at the following
output projection exactly as on the XLA path.

The context is a contextvar set around program TRACING (pipeline/transcribe
sets it inside its jitted window programs; tests and the multichip dryrun
set it explicitly). It deliberately does not affect already-compiled
programs -- it is read only while tracing.

SURVEY §5 (distributed backend): the reference is single-device
(src/bin/transcribe/main.rs:82); this composition is additive capability --
tensor-parallel serving keeps the Pallas decode/flash kernels instead of
falling back to the ~2x slower XLA attention (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    "whisper_tpu_kernel_mesh", default=None
)


def active_mesh():
    """The mesh set by `kernel_mesh`, or None."""
    return _ACTIVE.get()


@contextlib.contextmanager
def kernel_mesh(mesh):
    """Activate `mesh` for Pallas-kernel shard_map composition while tracing.

    Pass None for a no-op (callers can always wrap unconditionally)."""
    token = _ACTIVE.set(mesh)
    try:
        yield mesh
    finally:
        _ACTIVE.reset(token)


def tp_size(mesh=None) -> int:
    m = mesh if mesh is not None else active_mesh()
    return int(m.shape.get("tp", 1)) if m is not None else 1


def dp_axis(mesh, *batch_sizes: int) -> Optional[str]:
    """"dp" when the mesh data-parallel axis evenly divides every given
    batch-like size (so each shard gets whole rows/windows), else None."""
    dp = int(mesh.shape.get("dp", 1))
    if dp > 1 and all(b % dp == 0 for b in batch_sizes):
        return "dp"
    return None


def tp_axis(mesh, n_head: int, *channel_sizes: int) -> Optional[str]:
    """"tp" when the mesh tensor-parallel axis divides the head count (whole
    heads per shard) and every given channel size, else None."""
    tp = int(mesh.shape.get("tp", 1))
    if tp > 1 and n_head % tp == 0 and all(c % tp == 0 for c in channel_sizes):
        return "tp"
    return None
