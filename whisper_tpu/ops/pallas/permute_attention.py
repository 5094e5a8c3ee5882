"""Fused beam-reshuffle + append + single-query self-attention kernel.

Why it exists: the beam step previously touched the int8 self-KV cache
THREE times per layer-step -- the reshuffle permute read the valid prefix,
the permute wrote it, and the decode-attention kernel read it again (plus
an XLA dynamic-update-slice appending the new row). All three are pure HBM
streaming on a DMA-bound path (docs/PERFORMANCE.md round-3 block-size
sweep), so a third of that traffic is recoverable by fusing: this kernel
reads lane parents[i]'s prefix ONCE into VMEM, attends with it, patches the
new (appended) row in place, and writes the slab back out as lane i --
permute + append + attention in a single read + write pass.

Safety of the in-place formulation (the cache operands are aliased to the
outputs): beam parents are WINDOW-LOCAL (lane i's parent lives in the same
K-lane window, decode/beam.py's `parent` is an in-window index), the kernel
processes one window per pipeline stage, and every lane's source slab is
staged into VMEM before any of that window's write-backs start -- so no
read can observe a clobbered lane, regardless of the parent permutation's
cycle structure. Reads of window w+1 overlap compute of window w and
write-backs of window w-1 (double-buffered manual DMA; grid-style BlockSpec
pipelining cannot express per-lane parent indirection, which is why the
reshuffle needed a separate kernel before).

The reference reshuffles beam state host-side per step (whisper-burn
src/beam.rs:55-72); here the reshuffle is not even a separate device op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import (
    _attend,
    _bf16_exact,
    _head_sum_matrix,
    _head_sum_matrix_t,
)


def _fused_kernel(
    nw, k_lanes, cu, c, d,
    layer_ref, pos_ref, parents_ref, dests_ref, nks_ref, nvs_ref,
    q_ref, k_in, v_in, ks_in, vs_in, nk_ref, nv_ref,
    e_ref, et_ref,
    o_ref, k_out, v_out, ks_out, vs_out,
    kbuf, vbuf, ksbuf, vsbuf, rsem, wsem,
):
    """grid=(1,); windows are pipelined by an in-kernel fori_loop.

    kbuf/vbuf: (2, K, cu, d) VMEM int8 staging; ksbuf/vsbuf: (2, K, c) f32
    (scales stay whole-C: C sits in the lane dim, which DMA cannot
    sub-128-slice; at 4 B/row they are <1% of the slab bytes).
    rsem/wsem: per-slot DMA semaphores for reads / write-backs. The new-row
    scales ride scalar prefetch (SMEM): patched into the staged scale rows
    as broadcast scalars, no VMEM scalar extraction.

    Copy-on-write write-back: lane i's permuted+appended slab lands at slot
    dests_ref[i]. When dests_ref[i] == parents_ref[i] the slab is already in
    HBM at that slot (the lane "stays" in its parent's slot), so only the
    32-row tile containing the appended row is written -- the rest of the
    write DMA is elided. Conditional starts and waits share one predicate
    per lane, so the wsem byte accounting always balances. Scale rows are
    tiny (<1% of slab bytes) and are always written whole.
    """
    l = layer_ref[0]
    # Same fast/slow score-path selection as the unfused kernels: f32
    # queries (the strict-f32 parity configuration) need the two-pass
    # bf16 hi/lo split, bf16/int8 storage gets the exact one-pass fold.
    exact = _bf16_exact(q_ref.dtype, k_in.dtype, v_in.dtype)

    def reads(w, slot):
        cps = []
        for j in range(k_lanes):
            p = parents_ref[w * k_lanes + j]
            cps.append(pltpu.make_async_copy(
                k_in.at[p, l, pl.ds(0, cu)], kbuf.at[slot, j], rsem.at[slot]))
            cps.append(pltpu.make_async_copy(
                v_in.at[p, l, pl.ds(0, cu)], vbuf.at[slot, j], rsem.at[slot]))
            cps.append(pltpu.make_async_copy(
                ks_in.at[p, l], ksbuf.at[slot, j], rsem.at[slot]))
            cps.append(pltpu.make_async_copy(
                vs_in.at[p, l], vsbuf.at[slot, j], rsem.at[slot]))
        return cps

    def writes(w, slot, action):
        """Start ('start') or wait ('wait') window w's write-backs. Lanes
        that stay in their parent's slot (dest == src) write only the
        aligned tile holding the appended row; movers write the whole
        valid prefix to their (free) destination slot. The start and wait
        passes rebuild identical copy descriptors under identical
        predicates, keeping the shared-semaphore byte counts matched."""
        tile = 32 if cu % 32 == 0 else cu
        for j in range(k_lanes):
            i = w * k_lanes + j
            src = parents_ref[i]
            dst = dests_ref[i]
            base = (pos_ref[i] // tile) * tile
            full = [
                pltpu.make_async_copy(
                    kbuf.at[slot, j], k_out.at[dst, l, pl.ds(0, cu)],
                    wsem.at[slot]),
                pltpu.make_async_copy(
                    vbuf.at[slot, j], v_out.at[dst, l, pl.ds(0, cu)],
                    wsem.at[slot]),
            ]
            tiles = [
                pltpu.make_async_copy(
                    kbuf.at[slot, j, pl.ds(base, tile)],
                    k_out.at[dst, l, pl.ds(base, tile)], wsem.at[slot]),
                pltpu.make_async_copy(
                    vbuf.at[slot, j, pl.ds(base, tile)],
                    v_out.at[dst, l, pl.ds(base, tile)], wsem.at[slot]),
            ]
            always = [
                pltpu.make_async_copy(
                    ksbuf.at[slot, j], ks_out.at[dst, l], wsem.at[slot]),
                pltpu.make_async_copy(
                    vsbuf.at[slot, j], vs_out.at[dst, l], wsem.at[slot]),
            ]
            moved = dst != src

            @pl.when(moved)
            def _():
                for cp in full:
                    getattr(cp, action)()

            @pl.when(jnp.logical_not(moved))
            def _():
                for cp in tiles:
                    getattr(cp, action)()

            for cp in always:
                getattr(cp, action)()

    for cp in reads(0, 0):
        cp.start()

    def body(w, carry):
        slot = w % 2
        nslot = (w + 1) % 2

        # Prefetch window w+1 into the other slot -- whose previous
        # occupant's write-backs (window w-1) must have drained first.
        @pl.when(w + 1 < nw)
        def _():
            @pl.when(w >= 1)
            def _():
                writes(w - 1, nslot, "wait")
            for cp in reads(w + 1, nslot):
                cp.start()

        for cp in reads(w, slot):
            cp.wait()

        iota_c = jax.lax.broadcasted_iota(jnp.int32, (k_lanes, c), 1)
        # Patch appended rows + scales, K lanes at once (vector ops).
        pos_col = jnp.stack(
            [pos_ref[w * k_lanes + j] for j in range(k_lanes)]
        )[:, None]  # (K, 1) i32
        nks_col = jnp.stack(
            [nks_ref[w * k_lanes + j] for j in range(k_lanes)])[:, None]
        nvs_col = jnp.stack(
            [nvs_ref[w * k_lanes + j] for j in range(k_lanes)])[:, None]
        at_pos = iota_c == pos_col  # (K, c)
        ksbuf[slot] = jnp.where(at_pos, nks_col, ksbuf[slot])
        vsbuf[slot] = jnp.where(at_pos, nvs_col, vsbuf[slot])
        # ONE (K, c) -> (c, K) relayout per window per scale array; per-lane
        # (c,) -> (c, 1) relayouts cost ~0.9 ms/step at scale (see
        # _decode_attn_stacked_scaled_kernel's note).
        kst = jnp.transpose(ksbuf[slot])[:cu]  # (cu, K)
        vst = jnp.transpose(vsbuf[slot])[:cu]

        for j in range(k_lanes):
            i = w * k_lanes + j
            pos = pos_ref[i]
            nk = nk_ref[pl.ds(i, 1), 0]  # (1, d) int8
            nv = nv_ref[pl.ds(i, 1), 0]
            # Patch the appended row via an aligned-tile read-modify-write:
            # Mosaic requires dynamic sublane indices to be provably
            # tile-aligned, so load the 32-row tile containing `pos`,
            # select the row in, and store the tile back. Non-32-multiple
            # caches (tiny interpret-mode configs only; the wrapper rejects
            # them on hardware) patch the WHOLE buffer: tile = cu makes
            # base = (pos // cu) * cu == 0 for every valid pos < cu.
            tile = 32 if cu % 32 == 0 else cu
            base = (pos // tile) * tile
            row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
            kt = kbuf[slot, j, pl.ds(base, tile)]
            vt = vbuf[slot, j, pl.ds(base, tile)]
            at_row = row == (pos - base)
            kbuf[slot, j, pl.ds(base, tile)] = jnp.where(at_row, nk, kt)
            vbuf[slot, j, pl.ds(base, tile)] = jnp.where(at_row, nv, vt)

            o = _attend(
                pos,
                q_ref[pl.ds(i, 1), 0].astype(jnp.float32),  # (1, d)
                kbuf[slot, j].astype(jnp.float32),  # (cu, d)
                vbuf[slot, j].astype(jnp.float32),
                e_ref[:],
                et_ref[:],
                exact,
                ks=kst[:, j : j + 1],
                vs=vst[:, j : j + 1],
            )
            o_ref[pl.ds(i, 1), 0] = o.astype(o_ref.dtype)

        writes(w, slot, "start")
        return carry

    jax.lax.fori_loop(0, nw, body, 0)

    # Drain the final windows' write-backs (w <= nw-3 were waited inside
    # the loop's prefetch branch). nw is static.
    if nw >= 2:
        writes(nw - 2, (nw - 2) % 2, "wait")
    writes(nw - 1, (nw - 1) % 2, "wait")


def decode_attention_permute_fused(
    q: jax.Array,  # (B, D) single query, PRE-SCALED by head_dim^-0.5
    k_cache: jax.Array,  # (B, L, C, D) int8, batch-major (DONATED)
    v_cache: jax.Array,  # (B, L, C, D) int8 (DONATED)
    k_scale: jax.Array,  # (B, L, C) f32 per-row scales (DONATED)
    v_scale: jax.Array,  # (B, L, C) f32 (DONATED)
    new_k: jax.Array,  # (B, D) int8 quantized appended row
    new_v: jax.Array,  # (B, D) int8
    new_ks: jax.Array,  # (B,) f32 appended-row scales
    new_vs: jax.Array,  # (B,) f32
    parents: jax.Array,  # (B,) i32 beam parents -- WINDOW-LOCAL (module doc)
    pos: jax.Array,  # i32 scalar or (B,): append row AND highest visible row
    layer: jax.Array,  # i32 scalar
    n_head: int,
    beam_k: int,  # lanes per window; parents[i] // beam_k == i // beam_k
    c_used: int | None = None,  # static 32-multiple; every pos < c_used
    dests: jax.Array | None = None,  # (B,) i32 physical write slots (COW)
    interpret: bool = False,
):
    """Fused (reshuffle + append + attend) over ONE layer of the stacked
    int8 self-KV cache. Returns (attn (B, D), k_cache', v_cache',
    k_scale', v_scale') where the primed caches are the beam-permuted
    originals with the new row appended at `pos` -- semantically
    `permute_lanes_arrays` + dynamic_update_slice + decode_attention_stacked
    in one HBM pass. The cache/scale operands are aliased to their outputs
    (donated): pass values you own.

    `dests` (copy-on-write reshuffle, decode/beam.py::_cow_assign): lane i's
    slab is written to physical slot dests[i] instead of i, and when
    dests[i] == parents[i] the lane "stays" -- the slab is already in HBM at
    that slot and only the appended-row tile (+ scale rows) is written,
    eliding the full write-back DMA. Contract: dests are window-local and
    injective per window, and dests[i] == parents[i] implies the HBM slab at
    that slot already holds exactly the bytes the lane would have written
    (true for a reshuffle of an append-only cache). Slots outside the dests
    image keep their prior (now dead) contents. Default dests = arange(B):
    the pre-COW layout, where identity-parent lanes skip the (bitwise
    redundant) full write.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    b, l_all, c, d = k_cache.shape
    if b % beam_k:
        raise ValueError(f"batch {b} not divisible by beam_k {beam_k}")
    nw = b // beam_k
    cu = c if c_used is None else min(c_used, c)
    if cu != c and (cu <= 0 or cu % 32 != 0):
        cu = c
    if not interpret and cu % 32 != 0:
        # The in-kernel appended-row patch needs 32-row store alignment;
        # a non-multiple cache would index the staging buffer out of
        # bounds once pos crosses a tile (and Mosaic cannot prove the
        # sub-32 base). All production cache_len values are 128-multiples.
        raise ValueError(
            f"cache rows {c} (c_used={c_used}) must be a multiple of 32 "
            "on hardware"
        )

    pos_rows = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    layer_arr = jnp.asarray(layer, jnp.int32).reshape((1,))
    if dests is None:
        dests = jnp.arange(b, dtype=jnp.int32)

    e = jnp.asarray(_head_sum_matrix(d, n_head))
    et = jnp.asarray(_head_sum_matrix_t(d, n_head))

    def vspec(shape, ndim=None):
        nd = ndim if ndim is not None else len(shape)
        return pl.BlockSpec(
            shape, lambda *_: (0,) * nd, memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    q3 = q[:, None, :]
    nk3 = new_k[:, None, :]
    nv3 = new_v[:, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # layer, pos, parents, dests, new_ks, new_vs
        grid=(1,),
        in_specs=[
            vspec(q3.shape), any_spec, any_spec, any_spec, any_spec,
            vspec(nk3.shape), vspec(nv3.shape),
            vspec(e.shape), vspec(et.shape),
        ],
        out_specs=[
            vspec((b, 1, d)),
            any_spec, any_spec, any_spec, any_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, beam_k, cu, d), k_cache.dtype),
            pltpu.VMEM((2, beam_k, cu, d), v_cache.dtype),
            pltpu.VMEM((2, beam_k, c), jnp.float32),
            pltpu.VMEM((2, beam_k, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fused_kernel, nw, beam_k, cu, c, d)
    slab = 2 * b * cu * d * k_cache.dtype.itemsize + 2 * b * c * 4
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scale.shape, jnp.float32),
        ],
        # Aliasing: operand indices count the 6 scalar-prefetch args, then
        # q3 (6); the caches are operands 7..10 -> outputs 1..4.
        input_output_aliases={7: 1, 8: 2, 9: 3, 10: 4},
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cu * d * 2,
            bytes_accessed=2 * slab,
            transcendentals=b * cu,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(
        layer_arr, pos_rows, parents.astype(jnp.int32),
        dests.astype(jnp.int32),
        new_ks.astype(jnp.float32), new_vs.astype(jnp.float32),
        q3, k_cache, v_cache, k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
        nk3, nv3, e, et,
    )
    return (out[0][:, 0, :], out[1], out[2], out[3], out[4])
