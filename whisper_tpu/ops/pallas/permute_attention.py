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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import (
    NEG_INF,
    _attend,
    _bf16_exact,
    _group_matrices,
    _head_sum_matrix,
    _head_sum_matrix_t,
)


def _fused_kernel(
    nw, k_lanes, cu, c, d, np_,
    layer_ref, pos_ref, parents_ref, dests_ref, stage_ref, nks_ref, nvs_ref,
    q_ref, k_in, v_in, ks_in, vs_in, nk_ref, nv_ref,
    e_ref, et_ref,
    o_ref, k_out, v_out, ks_out, vs_out,
    kbuf, vbuf, ksbuf, vsbuf, rsem, wsem, dsem,
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

    Read dedup: when several lanes of a window share one parent (beam
    collapse -- the COMMON case on real audio and random-logit benches,
    where all K winners often descend from 1-2 lanes), only the FIRST
    claimant (stage_ref[i] == i) streams the slab from HBM; the other
    claimants fill their staging buffers with VMEM-local copies after the
    window's HBM reads land (dsem). HBM read traffic per window drops from
    K slabs to distinct(parents) slabs.
    """
    l = layer_ref[0]
    # Same fast/slow score-path selection as the unfused kernels: f32
    # queries (the strict-f32 parity configuration) need the two-pass
    # bf16 hi/lo split, bf16/int8 storage gets the exact one-pass fold.
    exact = _bf16_exact(q_ref.dtype, k_in.dtype, v_in.dtype)

    def reads(w, slot, action):
        """Start/wait window w's HBM reads: primary claimants only (the
        dup lanes are filled VMEM-locally in dup_fill). Matched predicates
        keep the rsem byte accounting balanced."""
        for j in range(k_lanes):
            i = w * k_lanes + j
            p = parents_ref[i]
            cps = [
                pltpu.make_async_copy(
                    k_in.at[p, l, pl.ds(0, cu)], kbuf.at[slot, j],
                    rsem.at[slot]),
                pltpu.make_async_copy(
                    v_in.at[p, l, pl.ds(0, cu)], vbuf.at[slot, j],
                    rsem.at[slot]),
                pltpu.make_async_copy(
                    ks_in.at[p, l], ksbuf.at[slot, j], rsem.at[slot]),
                pltpu.make_async_copy(
                    vs_in.at[p, l], vsbuf.at[slot, j], rsem.at[slot]),
            ]

            @pl.when(stage_ref[i] == i)
            def _():
                for cp in cps:
                    getattr(cp, action)()

    def dup_fill(w, slot, action):
        """Fill duplicate claimants' staging buffers from the primary's
        (VMEM-local copies; HBM reads for window w must have landed)."""
        for j in range(k_lanes):
            i = w * k_lanes + j
            sj = stage_ref[i] - w * k_lanes  # primary's in-window lane
            cps = [
                pltpu.make_async_copy(
                    kbuf.at[slot, sj], kbuf.at[slot, j], dsem),
                pltpu.make_async_copy(
                    vbuf.at[slot, sj], vbuf.at[slot, j], dsem),
                pltpu.make_async_copy(
                    ksbuf.at[slot, sj], ksbuf.at[slot, j], dsem),
                pltpu.make_async_copy(
                    vsbuf.at[slot, sj], vsbuf.at[slot, j], dsem),
            ]

            @pl.when(stage_ref[i] != i)
            def _():
                for cp in cps:
                    getattr(cp, action)()

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

    reads(0, 0, "start")

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
            reads(w + 1, nslot, "start")

        reads(w, slot, "wait")
        # duplicate-claimant lanes copy the primary's landed slab VMEM-
        # locally (tiny vs the elided HBM reads); must drain before the
        # scale patch below reads/writes the staging buffers
        dup_fill(w, slot, "start")
        dup_fill(w, slot, "wait")

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

        if np_ is None:
            # Per-lane attends (strict-f32 parity mode, or K lanes' bands
            # don't fit the 128-lane MXU tile).
            for j in range(k_lanes):
                i = w * k_lanes + j
                o = _attend(
                    pos_ref[i],
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
        else:
            # Banded window attend: ALL K lanes' scores in ONE GEMM pair.
            # Lane j's keys occupy rows [j*cu, (j+1)*cu) of the row-
            # concatenated staging buffer and its heads occupy the column
            # band [j*np_, j*np_ + n_head) (the _attend_group layout --
            # e_ref/et_ref carry e_mul/et_mul here). Cross-band products
            # are masked to exact zeros, so this is BITWISE equal to the
            # per-lane path (adding exact zeros to an f32 accumulation
            # changes nothing) while replacing 2K small serial GEMMs with
            # 2 MXU-sized ones -- the fused kernel is issue-bound, not
            # DMA-bound (tools/ablations/fused_kernel_sweep.py).
            rows = k_lanes * cu
            qw = jnp.concatenate(
                [q_ref[pl.ds(w * k_lanes + j, 1), 0]
                 for j in range(k_lanes)], axis=0).astype(jnp.float32)
            icol = jax.lax.broadcasted_iota(jnp.int32, (k_lanes, 128), 1)
            irow = jax.lax.broadcasted_iota(jnp.int32, (k_lanes, 128), 0)
            sel = (icol // np_ == irow).astype(jnp.float32)
            # One nonzero per output element: exact copies of q's bf16
            # values under default MXU precision.
            qx = jax.lax.dot_general(
                qw, sel, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (d, 128)
            qe = (qx * e_ref[:]).astype(jnp.bfloat16)

            k_all = kbuf[slot].reshape(rows, d).astype(jnp.bfloat16)
            v_all = vbuf[slot].reshape(rows, d).astype(jnp.bfloat16)
            s = jax.lax.dot_general(
                k_all, qe, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (rows, 128)

            # Exact f32 per-row K scales: lane j's (cu, 1) column scales its
            # static (cu, 128) row block (the proven _attend broadcast
            # pattern); the blocks reassemble by a uniform-layout sublane
            # concat. (Concatenating the (cu, 1) columns themselves is not
            # lowerable: their lane offsets differ.)
            s = jnp.concatenate(
                [s[j * cu : (j + 1) * cu] * kst[:, j : j + 1]
                 for j in range(k_lanes)], axis=0)

            ir = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            r_lane = ir // cu
            r_pos = ir % cu
            band = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // np_
            pos_vec = jnp.zeros((rows, 1), jnp.int32)
            for j in range(k_lanes):
                pos_vec = jnp.where(
                    r_lane == j, pos_ref[w * k_lanes + j], pos_vec)
            valid = (band == r_lane) & (r_pos <= pos_vec)
            s = jnp.where(valid, s, NEG_INF)

            m = jnp.max(s, axis=0, keepdims=True)
            p = jnp.exp(s - m)
            wgt = p / jnp.sum(p, axis=0, keepdims=True)
            # vs fold + sanitize: invalid rows (cross-band, beyond pos,
            # dead columns) go to exact 0 before the value GEMM; same
            # per-lane column broadcast + uniform-block concat as ks.
            wgt = jnp.concatenate(
                [wgt[j * cu : (j + 1) * cu] * jnp.where(
                    valid[j * cu : (j + 1) * cu], vst[:, j : j + 1], 0.0)
                 for j in range(k_lanes)], axis=0)

            o_heads = jax.lax.dot_general(
                wgt.astype(jnp.bfloat16), v_all,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (128, d)
            masked = o_heads * et_ref[:]
            for j in range(k_lanes):
                i = w * k_lanes + j
                o_ref[pl.ds(i, 1), 0] = jnp.sum(
                    masked[j * np_ : (j + 1) * np_], axis=0, keepdims=True
                ).astype(o_ref.dtype)

        writes(w, slot, "start")
        return carry

    jax.lax.fori_loop(0, nw, body, 0)

    # Drain the final windows' write-backs (w <= nw-3 were waited inside
    # the loop's prefetch branch). nw is static.
    if nw >= 2:
        writes(nw - 2, (nw - 2) % 2, "wait")
    writes(nw - 1, (nw - 1) % 2, "wait")


def compute_stage(parents: jax.Array, beam_k: int) -> jax.Array:
    """stage[i] = global lane index of the FIRST lane in i's window whose
    parent equals parents[i] (the lane that streams the shared slab from
    HBM; see the kernel's read-dedup contract). Tiny (B, K) integer ops --
    compute once per decode step, not per layer."""
    b = parents.shape[0]
    nw = b // beam_k
    pw = parents.reshape(nw, beam_k)
    same = pw[:, :, None] == pw[:, None, :]  # [w, i, j]
    stage_local = jnp.argmax(same, axis=2).astype(jnp.int32)  # first j
    offs = jnp.arange(nw, dtype=jnp.int32)[:, None] * beam_k
    return (stage_local + offs).reshape(b)


def _fused_sharded(mesh, q, k_cache, v_cache, k_scale, v_scale, new_k,
                   new_v, new_ks, new_vs, parents, pos, layer, n_head,
                   beam_k, c_used, dests, stage, interpret):
    """shard_map the fused reshuffle+append+attend kernel over ("dp"
    windows, "tp" heads).

    dp shards at WINDOW granularity: parents/dests are window-local by the
    kernel contract (parents[i] // beam_k == i // beam_k) and `stage` points
    at a lane of the same window, so all three index within the local shard
    after subtracting the shard's global lane offset. tp shards the channel
    axis in whole heads; the per-row scales and appended-row scales are
    head-independent, so every tp shard computes identical scale outputs
    (out_specs take one replica). Returns None when neither mesh axis
    divides the operands."""
    from jax.sharding import PartitionSpec as P

    from ...parallel import context as pctx

    b, d = q.shape
    nw = b // beam_k
    dp = pctx.dp_axis(mesh, nw)
    tp = pctx.tp_axis(mesh, n_head, d)
    if dp is None and tp is None:
        return None
    tp_n = pctx.tp_size(mesh) if tp else 1

    pos_rows = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (b,)
    )
    layer_s = jnp.asarray(layer, jnp.int32)
    cache_spec = P(dp, None, None, tp)
    scale_spec = P(dp, None, None)

    def inner(q, kc, vc, ks, vs, nk, nv, nks, nvs, par, dst, stg, pos,
              layer):
        # parents/dests/stage carry GLOBAL lane indices; rebase to this
        # shard's local lanes (windows never cross shards).
        if dp is not None:
            off = jax.lax.axis_index(dp).astype(jnp.int32) * q.shape[0]
            par, dst, stg = par - off, dst - off, stg - off
        with pctx.kernel_mesh(None):
            return decode_attention_permute_fused(
                q, kc, vc, ks, vs, nk, nv, nks, nvs, par, pos, layer,
                n_head // tp_n, beam_k, c_used=c_used, dests=dst, stage=stg,
                interpret=interpret,
            )

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(
            P(dp, tp), cache_spec, cache_spec, scale_spec, scale_spec,
            P(dp, tp), P(dp, tp), P(dp), P(dp),
            P(dp), P(dp), P(dp), P(dp), P(),
        ),
        out_specs=(
            P(dp, tp), cache_spec, cache_spec, scale_spec, scale_spec,
        ),
        check_vma=False,
    )(
        q, k_cache, v_cache, k_scale, v_scale, new_k, new_v, new_ks,
        new_vs, parents, dests, stage, pos_rows, layer_s,
    )


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
    stage: jax.Array | None = None,  # (B,) i32 first claimant of the parent
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

    `stage` (read dedup): stage[i] must be the GLOBAL lane index of the
    first lane in i's window with the same parent (stage[i] <= i,
    parents[stage[i]] == parents[i], stage[stage[i]] == stage[i]);
    computed from `parents` when omitted. Primary lanes (stage[i] == i)
    stream the slab from HBM; the rest copy it VMEM-locally.
    stage = arange(B) disables dedup (every lane reads HBM itself).
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
    if stage is None:
        stage = compute_stage(parents, beam_k)

    from ...parallel import context as pctx

    mesh = pctx.active_mesh()
    if mesh is not None:
        out = _fused_sharded(
            mesh, q, k_cache, v_cache, k_scale, v_scale, new_k, new_v,
            new_ks, new_vs, parents, pos_rows, layer, n_head, beam_k,
            c_used, dests, stage, interpret,
        )
        if out is not None:
            return out

    # Banded window attend (see _fused_kernel): active whenever the K
    # lanes' head bands fit one 128-lane MXU tile and storage dtypes admit
    # the exact one-pass bf16 fold. WHISPER_TPU_FUSED_GROUP=0 forces the
    # per-lane path for A/B (bitwise-identical results).
    group = _group_matrices(d, n_head, beam_k)
    exact = _bf16_exact(q.dtype, k_cache.dtype, v_cache.dtype)
    use_group = (
        group is not None and exact
        and os.environ.get("WHISPER_TPU_FUSED_GROUP", "1") != "0"
    )
    if use_group:
        _, e_mul, et_mul, np_ = group
        e = jnp.asarray(e_mul)
        et = jnp.asarray(et_mul)
    else:
        np_ = None
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
        # layer, pos, parents, dests, stage, new_ks, new_vs
        num_scalar_prefetch=7,
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
            pltpu.SemaphoreType.DMA,  # dsem: VMEM-local dup fills
        ],
    )
    kernel = functools.partial(_fused_kernel, nw, beam_k, cu, c, d, np_)
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
        # Aliasing: operand indices count the 7 scalar-prefetch args, then
        # q3 (7); the caches are operands 8..11 -> outputs 1..4.
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cu * d * 2,
            bytes_accessed=2 * slab,
            transcendentals=b * cu,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(
        layer_arr, pos_rows, parents.astype(jnp.int32),
        dests.astype(jnp.int32), stage.astype(jnp.int32),
        new_ks.astype(jnp.float32), new_vs.astype(jnp.float32),
        q3, k_cache, v_cache, k_scale.astype(jnp.float32),
        v_scale.astype(jnp.float32),
        nk3, nv3, e, et,
    )
    return (out[0][:, 0, :], out[1], out[2], out[3], out[4])
