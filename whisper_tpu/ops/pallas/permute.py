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

Here the permute is expressed as what it is -- direct HBM-to-HBM async
DMAs, one per (array, lane), all started before any wait so the DMA
engines stream back-to-back; each lane's trailing slab is contiguous, so
no VMEM round-trip is needed. The valid-prefix variant additionally skips
the cache rows past the current write position (masked in attention
anyway), dropping ~60% of the traffic over a 100-step decode.

Used by decode/beam.py's `_cache_gather` (the reference reshuffles beam
state host-side per step, whisper-burn src/beam.rs:55-72; here it is a
device-side cache permute inside one compiled loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _permute_prefix_kernel(b, n_arr, cc, chunk_mask, parents_ref, valid_ref,
                           *refs):
    # Valid-prefix variant: only cache rows [0, valid) hold data (rows past
    # the write position are masked in attention), so only ceil(valid/cc)
    # row-chunks are copied -- at 100-step decodes over a 128-row cache this
    # drops ~60% of the permute traffic on average. The output's tail rows
    # are left UNINITIALIZED; consumers must mask them (the decode kernel's
    # visibility mask does, including the int8 per-row scales -- see
    # decode_attention._attend's sanitized `vs`).
    #
    # chunk_mask marks which arrays chunk along axis 2 (the rank-4 caches).
    # The rank-3 per-row scale arrays keep C in the LANE dim, which Mosaic
    # DMA cannot sub-128-slice; at 4 bytes/row they are ~0.3% of the cache
    # traffic and are copied whole per lane.
    ins, outs, sem = refs[:n_arr], refs[n_arr : 2 * n_arr], refs[-1]
    nv = (valid_ref[0] + cc - 1) // cc

    def chunk_copies(t, i):
        p = parents_ref[i]
        return [
            pltpu.make_async_copy(
                src.at[p, :, pl.ds(t * cc, cc)],
                dst.at[i, :, pl.ds(t * cc, cc)],
                sem,
            )
            for m, (src, dst) in zip(chunk_mask, zip(ins, outs))
            if m
        ]

    def whole_copies(i):
        p = parents_ref[i]
        return [
            pltpu.make_async_copy(src.at[p], dst.at[i], sem)
            for m, (src, dst) in zip(chunk_mask, zip(ins, outs))
            if not m
        ]

    def start_chunk(t, carry):
        for i in range(b):
            for cp in chunk_copies(t, i):
                cp.start()
        return carry

    def wait_chunk(t, carry):
        for i in range(b):
            for cp in chunk_copies(t, i):
                cp.wait()
        return carry

    whole = [cp for i in range(b) for cp in whole_copies(i)]
    for cp in whole:
        cp.start()
    jax.lax.fori_loop(0, nv, start_chunk, 0)
    jax.lax.fori_loop(0, nv, wait_chunk, 0)
    for cp in whole:
        cp.wait()


def _permute_dma_kernel(b, n_arr, parents_ref, *refs):
    # Pure HBM->HBM DMAs: each lane's trailing slab is contiguous, so one
    # copy per (array, lane) moves the whole slab without a VMEM round-trip.
    # All n_arr*B copies are started before any wait, so the DMA engines
    # stream back-to-back; waits on the shared semaphore settle by total
    # byte count.
    ins, outs, sem = refs[:n_arr], refs[n_arr : 2 * n_arr], refs[-1]
    copies = []
    for i in range(b):
        p = parents_ref[i]
        for src, dst in zip(ins, outs):
            copies.append(pltpu.make_async_copy(src.at[p], dst.at[i], sem))
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()


def _permute_sharded(mesh, arrays, parents, interpret, valid_len, chunk,
                     chunk_mask, beam_k):
    """shard_map the lane permute over ("dp" windows, "tp" channels).

    Valid only when the caller passes `beam_k` (the window size): the
    beam-reshuffle contract parents[i] // beam_k == i // beam_k makes every
    lane's source live in the same window, so dp shards at whole-window
    granularity rebase parents by the shard's lane offset. tp shards the
    trailing (channel) axis of the rank-4 cache arrays; lower-rank arrays
    (per-row scales) stay tp-replicated. Returns None when dp doesn't
    divide the window count (tp-only sharding of a pure permute saves
    nothing by itself but keeps the operands resident)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel import context as pctx

    b = arrays[0].shape[0]
    nw = b // beam_k if beam_k and b % beam_k == 0 else 0
    dp = pctx.dp_axis(mesh, nw) if nw else None
    tp_n = pctx.tp_size(mesh)
    if dp is None and tp_n <= 1:
        return None

    def spec(a):
        tp = ("tp" if tp_n > 1 and a.ndim >= 4 and a.shape[-1] % tp_n == 0
              else None)
        return P(dp, *(None,) * (a.ndim - 2), tp)

    specs = tuple(spec(a) for a in arrays)
    extra = [parents.astype(jnp.int32)]
    espec = [P(dp)]
    if valid_len is not None:
        extra.append(jnp.asarray(valid_len, jnp.int32))
        espec.append(P())

    def inner(parents, *rest):
        if valid_len is not None:
            vl, arrs = rest[0], rest[1:]
        else:
            vl, arrs = None, rest
        if dp is not None:
            parents = parents - (
                jax.lax.axis_index(dp).astype(jnp.int32) * arrs[0].shape[0]
            )
        with pctx.kernel_mesh(None):
            return permute_lanes_arrays(
                arrs, parents, interpret=interpret, valid_len=vl,
                chunk=chunk, chunk_mask=chunk_mask,
            )

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=tuple(espec) + specs, out_specs=specs,
        check_vma=False,
    )(*extra, *arrays)


def permute_lanes_arrays(
    arrays,  # sequence of (B, ...) arrays sharing the lane (leading) axis
    parents: jax.Array,  # (B,) i32: out[i] = in[parents[i]]
    interpret: bool = False,
    valid_len: jax.Array | None = None,  # i32: copy only rows [0, valid)
    chunk: int = 32,  # row granularity of the prefix copy
    chunk_mask=None,  # per-array: chunk along axis 2 (False: copy whole)
    beam_k: int | None = None,  # lanes per window (mesh sharding contract)
):
    """Permute the lane (leading) axis of several arrays in one pallas_call.

    Returns a tuple of permuted arrays; the (array, lane) DMA copies share
    one grid invocation and one semaphore, so fixed costs are paid once.

    With `valid_len`, arrays marked in `chunk_mask` (default: every rank-4
    array) must have their row axis at position 2 and only rows [0, valid)
    are copied; the permuted outputs' tail rows are UNINITIALIZED and must
    be masked by the consumer.

    With `beam_k` (window-local parents: parents[i] // beam_k == i //
    beam_k) and an active kernel mesh (parallel/context), the permute
    shard_maps over ("dp" windows, "tp" channels) instead of lowering to a
    replicated custom call.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    arrays = tuple(arrays)

    from ...parallel import context as pctx

    mesh = pctx.active_mesh()
    if mesh is not None and beam_k is not None:
        out = _permute_sharded(
            mesh, arrays, parents, interpret, valid_len, chunk, chunk_mask,
            beam_k,
        )
        if out is not None:
            return out
    if not interpret and any(a.shape[-1] % 128 for a in arrays):
        # Mosaic DMA slices need the lane (trailing) dim 128-aligned; real
        # model widths are (d and cache_len are multiples of 128), but toy
        # test configs on a real chip are not -- fall back to the plain XLA
        # gather there (slow path, correctness only).
        return tuple(jnp.take(a, parents, axis=0) for a in arrays)
    b = arrays[0].shape[0]
    n = len(arrays)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if valid_len is None:
        kernel = functools.partial(_permute_dma_kernel, b, n)
        scalars = (parents.astype(jnp.int32),)
    else:
        if chunk_mask is None:
            chunk_mask = tuple(a.ndim >= 4 for a in arrays)
        for a, m in zip(arrays, chunk_mask):
            # The prefix copy rounds valid up to whole chunks; a partial
            # final chunk would index rows past C (out-of-bounds DMA).
            if m and a.shape[2] % chunk != 0:
                raise ValueError(
                    f"chunked array row count {a.shape[2]} must be a "
                    f"multiple of chunk={chunk}"
                )
        kernel = functools.partial(
            _permute_prefix_kernel, b, n, chunk, tuple(chunk_mask))
        scalars = (
            parents.astype(jnp.int32),
            jnp.asarray(valid_len, jnp.int32).reshape((1,)),
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(1,),
        in_specs=[any_spec] * n,
        out_specs=[any_spec] * n,
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    total = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrays)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays],
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * total, transcendentals=0,
        ),
        interpret=interpret,
    )(*scalars, *arrays)
    return tuple(out)


def permute_lanes_pair(
    k: jax.Array,  # (B, L, C, d) batch-major self-KV cache
    v: jax.Array,  # same shape/dtype as k
    parents: jax.Array,  # (B,) i32: out[i] = in[parents[i]]
    interpret: bool = False,
):
    """Permute the lane (leading) axis of a batch-major KV-cache pair."""
    return permute_lanes_arrays((k, v), parents, interpret)
