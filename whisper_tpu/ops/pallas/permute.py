"""Pallas lane-permute kernel for the beam-search KV-cache reshuffle.

Why it exists: the beam reshuffle `out[i] = in[parents[i]]` over the
batch-major (B, L, C, d) self-KV cache is pure data movement, yet every XLA
formulation measured far off the memory roofline at large-v2 W=8 K=5
(cache pair = 1.7 GB of traffic/step, roofline ~2 ms):

  * `jnp.take` on the leading axis (contiguous (L*C*d) slabs): 8.8 ms/step
    -- XLA lowers the gather to a dynamic-slice loop that does not stream;
  * one-hot MXU matmul over a layer-major cache: 7.7 ms/step;
  * an elementwise-producible fresh buffer of the same shape: ~0 ms --
    pinning the blame on the gather lowering, not the data movement
    (docs/PERFORMANCE.md round-2 beam log).

Here the permute is expressed as what it is -- a batch of block DMA copies.
The grid walks (lane, layer-block); the INPUT index_map reads the
scalar-prefetched parent lane, the output block is the grid lane, and the
kernel body is a straight VMEM copy. Mosaic double-buffers the block DMAs,
so the copy streams at memory speed.

Used by decode/beam.py's `_cache_gather` (the reference reshuffles beam
state host-side per step, whisper-burn src/beam.rs:55-72; here it is a
device-side cache permute inside one compiled loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _permute_kernel(parents_ref, k_ref, v_ref, ko_ref, vo_ref):
    del parents_ref  # consumed by the BlockSpec index_maps
    ko_ref[...] = k_ref[...]
    vo_ref[...] = v_ref[...]


def _permute_dma_kernel(b, parents_ref, k_ref, v_ref, ko_ref, vo_ref, sem):
    # Pure HBM->HBM DMAs: each lane's (L, C, d) slab is contiguous, so one
    # copy per (array, lane) moves the whole slab without a VMEM round-trip.
    # All 2B copies are started before any wait, so the DMA engines stream
    # back-to-back; waits on the shared semaphore settle by total byte count.
    copies = []
    for i in range(b):
        p = parents_ref[i]
        copies.append(pltpu.make_async_copy(k_ref.at[p], ko_ref.at[i], sem))
        copies.append(pltpu.make_async_copy(v_ref.at[p], vo_ref.at[i], sem))
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def permute_lanes_pair(
    k: jax.Array,  # (B, L, C, d) batch-major self-KV cache
    v: jax.Array,  # same shape/dtype as k
    parents: jax.Array,  # (B,) i32: out[i] = in[parents[i]]
    interpret: bool = False,
):
    """Permute the lane (leading) axis of a batch-major KV-cache pair.

    Returns (k_out, v_out) with out[i] = in[parents[i]]. Both arrays are
    permuted in one pallas_call so the (lane, layer-block) grid's fixed
    costs are paid once for the pair.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    b, l, c, d = k.shape

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[any_spec, any_spec],
        out_specs=[any_spec, any_spec],
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_permute_dma_kernel, b),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=4 * b * l * c * d * k.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(parents.astype(jnp.int32), k, v)
