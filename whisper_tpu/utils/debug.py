"""Debug/numerics helpers (SURVEY.md §5: the JAX analog of the reference's
(absent) sanitizer story -- nan-debugging and determinism checks instead of
race detection, which has no meaning in a single-control-thread XLA program).
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Raise on the first NaN produced inside the context (jax_debug_nans)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree, name: str = "pytree") -> None:
    """Host-side finiteness check over a pytree (checkpoint sanity)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            key = "/".join(str(p) for p in path)
            raise FloatingPointError(f"{name}: non-finite values at {key}")
