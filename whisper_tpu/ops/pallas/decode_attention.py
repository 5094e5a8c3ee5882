"""Pallas single-query ("decode-step") attention kernel.

Why it exists: during autoregressive decoding the XLA attention path lowers
`einsum('bqhd,bkhd->bhqk')` with q_len=1 into B*H batched GEMMs with ONE row
each -- at large-v2 b16 that is 320 M=1 matmuls per einsum per layer, and
per-GEMM launch overhead dominates: ablation measured ~6.8 ms/step of the
13.4 ms decode step in the attention einsums alone, versus ~0.4 ms of actual
cache traffic.

Design (one grid step per batch element; caches stay in their natural flat
(C, D) layout -- no per-step relayout):

    qE      = q (1, D) * E (D, Hp)           VPU: E is the block-diagonal ones
                                             matrix E[h*hd + d, h] = 1; folding
                                             q into it keeps both GEMM operands
                                             exactly bf16 (see _attend)
    s       = K (C, D) @ qE (D, Hp)          MXU: column h is head h's scores --
                                             one (C x D)x(D x Hp) GEMM with C
                                             rows, not B*H one-row GEMMs
    w       = softmax over C (mask c > pos)  VPU
    o_heads = w^T (Hp, C) @ V (C, D)         MXU: every head's weighted value
                                             sum, for every channel
    o       = sum_h o_heads * E^T            VPU: extract head h's channels

A first version used a (batch, head) grid with per-head (C, hd) tiles; its
20480 tiny grid iterations per decode step were SLOWER than XLA (89x vs 154x
real-time end to end) -- grid steps are cheap but not free. This version runs
B grid steps per layer.

Serves both causal self-attention over the KV cache (pos = current position)
and cross-attention over encoder keys (pos = Sa - 1, i.e. everything visible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _head_sum_matrix(d: int, n_head: int) -> np.ndarray:
    """(D, Hp) block-diagonal ones: column h sums lanes [h*hd, (h+1)*hd)."""
    hd = d // n_head
    hp = _round_up(n_head, 128)
    e = np.zeros((d, hp), np.float32)
    for h in range(n_head):
        e[h * hd : (h + 1) * hd, h] = 1.0
    return e


@functools.lru_cache(maxsize=8)
def _group_matrices(d: int, n_head: int, rep: int):
    """Constants for the grouped (kv_rep-lane) attention: rep lanes sharing
    one KV block are scored in ONE GEMM by giving each lane its own column
    band [r*np, r*np + n_head) of the Hp=128 MXU tile (np = n_head rounded
    up to the 8-row sublane granularity so the per-lane output extraction
    slices stay aligned).

    Returns (sel (rep8, Hp), e_mul (D, Hp), et_mul (Hp, D), np):
      sel[r, r*np + h] = 1        -- scatters lane r's query into its band
      e_mul[:, r*np + h] = E[:, h] -- the head-sum pattern, per band
      et_mul[r*np + h, :] = E^T[h, :] -- head-extraction mask, per band
    """
    hp = 128
    np_ = _round_up(n_head, 8)
    if np_ * rep > hp:
        return None
    hd = d // n_head
    sel = np.zeros((_round_up(rep, 8), hp), np.float32)
    e_mul = np.zeros((d, hp), np.float32)
    et_mul = np.zeros((hp, d), np.float32)
    for r in range(rep):
        for h in range(n_head):
            col = r * np_ + h
            sel[r, col] = 1.0
            e_mul[h * hd : (h + 1) * hd, col] = 1.0
            et_mul[col, h * hd : (h + 1) * hd] = 1.0
    return sel, e_mul, et_mul, np_


def _bf16_exact(*dtypes) -> bool:
    """True when every storage dtype's values are exactly bf16-representable
    (bf16 itself, or int8/int4: small integers fit bf16's 8-bit mantissa).
    """
    return all(
        jnp.dtype(t) in (
            jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.int8), jnp.dtype(jnp.int4)
        )
        for t in dtypes
    )


def _attend(pos, q, k, v, e, e_t, exact: bool, ks=None, vs=None):
    """Single-query attention math shared by the flat and stacked kernels.

    pos: i32 scalar (highest visible key row, inclusive); q (1, D) f32;
    k/v (C, D) f32; e (D, Hp) the block-diagonal head-sum matrix and
    e_t (Hp, D) its transpose; `exact` (static) = the q/k/v STORAGE dtypes
    are exactly bf16-representable (bf16 or int8). Returns (1, D) f32.

    Fast path (`exact`, the production bf16/int8 configs) -- scores at exact
    f32 accuracy in ONE default-precision MXU pass: instead of forming
    t = k * q in f32 (whose 16-bit mantissas then need a two-pass bf16 hi/lo
    GEMM split), fold q INTO the head-sum matrix: qE[d, h] = q[d] * E[d, h].
    Both GEMM operands are then exactly bf16 (k's values come from bf16/int8
    storage; qE's entries ARE q's bf16 values), and the MXU multiplies bf16
    pairs exactly and accumulates in f32 -- the exact f32 dot product,
    strictly more accurate than the hi/lo split at half its MXU passes and
    with no (C, D) f32 elementwise pass. The output side contracts over keys
    FIRST -- o_heads (Hp, D) = w^T @ v -- then extracts each head's diagonal
    block with the e_t mask (a small (Hp, D) elementwise+reduce), replacing
    the w @ E^T broadcast GEMM AND the (C, D) multiply+reduce against v. The
    only rounding is one bf16 cast of the softmax weights, which the slow
    path's broadcast GEMM also incurs.

    Slow path (f32 storage, the strict-f32 parity configuration): bf16
    casts of k/q would lose mantissa, so keep t = k * q in exact f32 and
    reduce with the classic two-pass bf16 hi/lo split (~1e-5 relative), and
    apply softmax weights to v in f32.
    """
    c = k.shape[0]

    if exact:
        qe = (q.reshape(-1, 1) * e).astype(jnp.bfloat16)  # (D, Hp), exact
        s = jax.lax.dot_general(
            k.astype(jnp.bfloat16), qe, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, Hp)
    else:
        t = k * q  # (C, D) f32, exact
        t_hi = t.astype(jnp.bfloat16)
        t_lo = (t - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        e_b = e.astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        s = jax.lax.dot_general(
            t_hi, e_b, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            t_lo, e_b, dims, preferred_element_type=jnp.float32
        )  # (C, Hp)

    # Per-row int8 scales (self-KV quantization): K's row scale multiplies
    # its score row, V's multiplies the softmax weight -- both O(C) VPU.
    if ks is not None:
        s = s * ks  # (C, 1) broadcast over heads

    idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    s = jnp.where(idx > pos, NEG_INF, s)

    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=0, keepdims=True)  # (C, Hp) f32
    if vs is not None:
        # Sanitize masked rows: the valid-prefix beam permute leaves tail
        # rows (and their scales) uninitialized, and 0-weight * NaN-scale
        # would still poison the output GEMM's accumulation.
        w = w * jnp.where(idx > pos, 0.0, vs)  # (C, 1)

    if exact:
        o_heads = jax.lax.dot_general(
            w.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Hp, D): head h's weighted sum over keys, for EVERY channel d
        return jnp.sum(o_heads * e_t, axis=0, keepdims=True)  # (1, D)

    # E is block-diagonal 0/1: each w_exp element is a plain copy of one w
    # element (no accumulation), so default MXU precision is exact here up to
    # a single bf16 round of w -- negligible against the softmax output.
    w_exp = jax.lax.dot_general(
        w, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, D)
    return jnp.sum(v * w_exp, axis=0, keepdims=True)  # (1, D)


def _attend_group(pos, q_rows, k, v, sel, e_mul, et_mul, np_, rep):
    """Single-query attention of `rep` lanes against ONE shared (C, D) KV
    block, in one GEMM pair (see _group_matrices).

    The per-lane qE construction of _attend wastes 1 - n_head/128 of every
    MXU pass (Hp pads n_head up to the 128-lane tile); at large-v2 beam
    (n_head=20, rep=5) that made cross-attention MXU-bound at ~6.4x the
    useful work. Here lane r's scaled query occupies columns
    [r*np, r*np + n_head): one k @ qE pass scores ALL rep lanes, one
    w^T @ v pass produces all their head sums. Requires every lane to see
    the same `pos` (true for cross-attention: pos = Sa - 1).

    q_rows: (rep, D) f32 pre-scaled; returns (rep, D) f32.
    """
    c = k.shape[0]
    # qE[d, r*np+h] = q_r[d] * E[d, h]: scatter rows into bands via the 0/1
    # selector GEMM (exact copies under f32 accumulation), mask with the
    # head-sum pattern. Entries are exactly the bf16 query values, so the
    # score GEMM below runs at exact f32 accuracy in one default-precision
    # MXU pass (same argument as _attend's fast path).
    qt = jnp.transpose(q_rows)  # (D, rep)
    qx = jax.lax.dot_general(
        qt, sel[: q_rows.shape[0]], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, Hp): column r*np+h = q_r
    qe = (qx * e_mul).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        k.astype(jnp.bfloat16), qe, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (C, Hp)

    idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    s = jnp.where(idx > pos, NEG_INF, s)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    w = p / jnp.sum(p, axis=0, keepdims=True)  # (C, Hp) f32

    o = jax.lax.dot_general(
        w.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Hp, D): row r*np+h = lane r head h's weighted value sum
    masked = o * et_mul  # zero the dead columns-band rows, mask head lanes
    return jnp.concatenate(
        [
            jnp.sum(masked[r * np_ : (r + 1) * np_], axis=0, keepdims=True)
            for r in range(rep)
        ],
        axis=0,
    )  # (rep, D)


def _decode_attn_kernel(pos_ref, q_ref, k_ref, v_ref, e_ref, et_ref, o_ref):
    # pos_ref: the whole (B,) array in SMEM (Mosaic cannot block rank-1 SMEM
    # below the tile size); this row's visibility is pos_ref[program_id].
    pos = pos_ref[pl.program_id(0)]
    o = _attend(
        pos,
        q_ref[0].astype(jnp.float32),  # (1, D)
        k_ref[0].astype(jnp.float32),  # (C, D)
        v_ref[0].astype(jnp.float32),
        e_ref[:],  # (D, Hp)
        et_ref[:],  # (Hp, D)
        _bf16_exact(q_ref.dtype, k_ref.dtype, v_ref.dtype),
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _decode_attention_call(q, k_cache, v_cache, pos, n_head, interpret):
    """One pallas_call over a (B,) grid; pos is (B,) per-row visibility."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    b, c, d = k_cache.shape

    e = jnp.asarray(_head_sum_matrix(d, n_head))
    e_t = jnp.asarray(_head_sum_matrix_t(d, n_head))
    q3 = q[:, None, :]  # (B, 1, D)

    out = pl.pallas_call(
        _decode_attn_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, e.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e.shape[1], d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, 1, d),
            q.dtype if v_cache.dtype in (jnp.int8, jnp.int4) else v_cache.dtype,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * d * (2 * e.shape[1] // 128),
            bytes_accessed=2 * b * c * d * k_cache.dtype.itemsize,
            transcendentals=b * c * e.shape[1],
        ),
        interpret=interpret,
    )(pos.astype(jnp.int32), q3, k_cache, v_cache, e, e_t)

    return out[:, 0, :]


@functools.lru_cache(maxsize=8)
def _head_sum_matrix_t(d: int, n_head: int) -> np.ndarray:
    """(Hp, D) transpose of `_head_sum_matrix`: row h masks head h's lanes."""
    return np.ascontiguousarray(_head_sum_matrix(d, n_head).T)


@functools.lru_cache(maxsize=8)
def _make_decode_attention(n_head: int, interpret: bool):
    """Build the (n_head, interpret)-specialized kernel entry with a custom
    vmap rule.

    Why custom vmap: `beam_search_batched` vmaps the whole decode program
    over independent windows. Pallas's default batching rule prepends a grid
    axis and turns the (B,) SMEM pos argument into a (W, B) block that Mosaic
    refuses to lower. Batching here is trivial instead: a (W, B, ...) call IS
    a (W*B, ...) call -- rows are independent -- so the rule flattens the
    vmapped axis into the kernel grid (one launch, no relayout; reshapes of
    leading axes are free).
    """

    @jax.custom_batching.custom_vmap
    def attn(q, k_cache, v_cache, pos):
        b = k_cache.shape[0]
        pos_rows = jnp.broadcast_to(
            jnp.asarray(pos, jnp.int32).reshape(-1), (b,)
        )
        mesh = _active_mesh()
        if mesh is not None:
            out = _decode_attention_sharded(
                mesh, q, k_cache, v_cache, pos_rows, n_head, interpret
            )
            if out is not None:
                return out
        return _decode_attention_call(
            q, k_cache, v_cache, pos_rows, n_head, interpret
        )

    @attn.def_vmap
    def _attn_vmap(axis_size, in_batched, q, k_cache, v_cache, pos):
        qb, kb, vb, pb = in_batched

        def bcast(x, batched):
            x = jnp.asarray(x)
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        q = bcast(q, qb)  # (W, B, D)
        k_cache = bcast(k_cache, kb)  # (W, B, C, D)
        v_cache = bcast(v_cache, vb)
        w, b = q.shape[0], q.shape[1]
        pos = jnp.asarray(pos, jnp.int32)
        if not pb:
            pos = jnp.broadcast_to(pos.reshape(-1)[None], (w, b))
        elif pos.ndim == 1:  # batched scalar: one pos per window
            pos = jnp.broadcast_to(pos[:, None], (w, b))
        out = attn(
            q.reshape(w * b, -1),
            k_cache.reshape((w * b,) + k_cache.shape[2:]),
            v_cache.reshape((w * b,) + v_cache.shape[2:]),
            pos.reshape(w * b),
        )
        return out.reshape(w, b, -1), True

    return attn


def _active_mesh():
    from ...parallel import context as pctx

    return pctx.active_mesh()


def _decode_attention_sharded(mesh, q, k_cache, v_cache, pos_rows, n_head,
                              interpret):
    """shard_map the flat decode kernel over ("dp" batch, "tp" heads): each
    device runs the same kernel on its local (rows, head-lanes) slice --
    whole heads per tp shard, no in-kernel collectives (GSPMD inserts the
    row-parallel psum at the following output projection). Returns None
    when neither axis divides the operands (caller falls through)."""
    from jax.sharding import PartitionSpec as P

    from ...parallel import context as pctx

    dp = pctx.dp_axis(mesh, q.shape[0])
    tp = pctx.tp_axis(mesh, n_head, q.shape[-1])
    if dp is None and tp is None:
        return None
    tp_n = pctx.tp_size(mesh) if tp else 1

    def inner(q, k, v, pos):
        return _decode_attention_call(
            q, k, v, pos, n_head // tp_n, interpret
        )

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(dp, tp), P(dp, None, tp), P(dp, None, tp), P(dp)),
        out_specs=P(dp, tp),
        check_vma=False,
    )(q, k_cache, v_cache, pos_rows)


def decode_attention(
    q: jax.Array,  # (B, D) single query, PRE-SCALED by head_dim^-0.5
    k_cache: jax.Array,  # (B, C, D)
    v_cache: jax.Array,  # (B, C, D)
    pos: jax.Array,  # i32 scalar or (B,): highest visible cache row (incl.)
    n_head: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, D) attention output in v_cache.dtype. vmap-safe.

    Under an active kernel mesh (parallel/context) the call shard_maps over
    ("dp" rows, "tp" heads) instead of lowering to a replicated custom call.
    """
    return _make_decode_attention(n_head, interpret)(q, k_cache, v_cache, pos)


def _decode_attn_stacked_group_kernel(
    rb, batch_major, kv_rep, np_, layer_ref, pos_ref, q_ref, k_ref, v_ref,
    sel_ref, em_ref, etm_ref, o_ref
):
    # Grouped kv_rep path: each shared KV block serves its kv_rep query
    # lanes in one GEMM pair (_attend_group). Cross-attention only: every
    # lane shares pos (= Sa - 1), so one pos value covers the block.
    i = pl.program_id(0)
    wb = rb // kv_rep
    pos = pos_ref[i * rb]
    for w in range(wb):
        q_rows = q_ref[w * kv_rep : (w + 1) * kv_rep, 0].astype(jnp.float32)
        o = _attend_group(
            pos,
            q_rows,
            (k_ref[w, 0] if batch_major else k_ref[0, w]).astype(jnp.float32),
            (v_ref[w, 0] if batch_major else v_ref[0, w]).astype(jnp.float32),
            sel_ref[:],
            em_ref[:],
            etm_ref[:],
            np_,
            kv_rep,
        )
        o_ref[w * kv_rep : (w + 1) * kv_rep] = o[:, None, :].astype(
            o_ref.dtype
        )


def _decode_attn_stacked_scaled_kernel(
    rb, lb, cu, layer_ref, pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
    e_ref, et_ref, o_ref
):
    # Batch-major int8 self-KV path: per-row scale blocks (rb, lb, c) cover
    # lb layers (Pallas requires the second-minor block dim divisible by 8,
    # so single-layer scale rows cannot be block-sliced directly); the
    # layer's row is selected in-kernel and transposed to a (C, 1) column
    # that _attend applies to scores / softmax weights.
    i = pl.program_id(0)
    li = layer_ref[0] % lb
    exact = _bf16_exact(q_ref.dtype, k_ref.dtype, v_ref.dtype)
    # ONE (rb, C) -> (C, rb) relayout per grid step for each of k/v; the
    # per-row (C, 1) columns are then free static lane slices. A per-row
    # transpose variant cost ~0.9 ms/step at large-v2 b32 (2048 tiny
    # relayouts); this form does 2.
    # Scale blocks stay whole-C (C sits in the lane dim, which Mosaic DMA
    # cannot sub-128-slice; at 4 B/row they are ~0.3% of the traffic) --
    # slice to the k/v blocks' c_used rows after the transpose.
    kst = jnp.transpose(ks_ref[:, li])[:cu]  # (cu, rb) f32
    vst = jnp.transpose(vs_ref[:, li])[:cu]
    for j in range(rb):
        o = _attend(
            pos_ref[i * rb + j],
            q_ref[j].astype(jnp.float32),  # (1, D)
            k_ref[j, 0].astype(jnp.float32),
            v_ref[j, 0].astype(jnp.float32),
            e_ref[:],
            et_ref[:],
            exact,
            ks=kst[:, j : j + 1],  # (C, 1)
            vs=vst[:, j : j + 1],
        )
        o_ref[j] = o.astype(o_ref.dtype)


def _decode_attn_stacked_kernel(
    rb, batch_major, kv_rep, layer_ref, pos_ref, q_ref, k_ref, v_ref, e_ref,
    et_ref, o_ref
):
    # layer_ref/pos_ref are scalar-prefetch args: consumed by the BlockSpec
    # index_maps (layer selection) and here (per-row visibility). rb (static)
    # batch rows are processed per grid step: larger blocks amortize the
    # per-grid-step fixed cost (DMA setup, semaphores) across rows -- at
    # large-v2 b32 the (B,) grid ran 2048 iterations per decode step and the
    # fixed cost was ~30% of kernel time (docs/PERFORMANCE.md step 16).
    # kv_rep > 1: kv row j//kv_rep serves q rows [j, j+kv_rep) -- the
    # beam-search cross-attention case where all beam lanes of one window
    # share one cross-KV copy.
    i = pl.program_id(0)
    exact = _bf16_exact(q_ref.dtype, k_ref.dtype, v_ref.dtype)
    for j in range(rb):
        jk = j // kv_rep
        o = _attend(
            pos_ref[i * rb + j],
            q_ref[j].astype(jnp.float32),  # (1, D)
            (k_ref[jk, 0] if batch_major else k_ref[0, jk]).astype(
                jnp.float32),
            (v_ref[jk, 0] if batch_major else v_ref[0, jk]).astype(
                jnp.float32),
            e_ref[:],  # (D, Hp)
            et_ref[:],  # (Hp, D)
            exact,
        )
        o_ref[j] = o.astype(o_ref.dtype)


def _stacked_sharded(mesh, q, k_cache, v_cache, pos, layer, n_head,
                     interpret, batch_major, kv_rep, k_rowscale, v_rowscale,
                     c_used):
    """shard_map `decode_attention_stacked` over ("dp" kv rows, "tp" heads).

    dp shards at KV-row granularity (whole kv_rep-lane windows per shard:
    q lanes of one window are contiguous, so a dp split of the q batch
    aligns with the kv batch split). tp shards the channel axis in whole
    heads (Megatron layout, parallel/sharding.py); the int8 per-row scales
    are head-independent and stay replicated over tp. Returns None when
    neither axis divides the operands."""
    from jax.sharding import PartitionSpec as P

    from ...parallel import context as pctx

    b, d = q.shape
    bk = k_cache.shape[0] if batch_major else k_cache.shape[1]
    dp = pctx.dp_axis(mesh, bk)
    tp = pctx.tp_axis(mesh, n_head, d)
    if dp is None and tp is None:
        return None
    tp_n = pctx.tp_size(mesh) if tp else 1

    kv_spec = (P(dp, None, None, tp) if batch_major
               else P(None, dp, None, tp))
    pos_rows = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (b,)
    )
    layer_s = jnp.asarray(layer, jnp.int32)
    args = [q, k_cache, v_cache, pos_rows, layer_s]
    specs = [P(dp, tp), kv_spec, kv_spec, P(dp), P()]
    has_scales = k_rowscale is not None
    if has_scales:
        args += [k_rowscale, v_rowscale]
        specs += [P(dp, None, None), P(dp, None, None)]

    def inner(q, k, v, pos, layer, *scales):
        ks, vs = scales if scales else (None, None)
        with pctx.kernel_mesh(None):
            return decode_attention_stacked(
                q, k, v, pos, layer, n_head // tp_n, interpret=interpret,
                batch_major=batch_major, kv_rep=kv_rep,
                k_rowscale=ks, v_rowscale=vs, c_used=c_used,
            )

    return jax.shard_map(
        inner, mesh=mesh, in_specs=tuple(specs), out_specs=P(dp, tp),
        check_vma=False,
    )(*args)


def decode_attention_stacked(
    q: jax.Array,  # (B, D) single query, PRE-SCALED by head_dim^-0.5
    k_cache: jax.Array,  # (L, B, C, D), or (B, L, C, D) if batch_major
    v_cache: jax.Array,  # same stacking as k_cache
    pos: jax.Array,  # i32 scalar or (B,): highest visible cache row (incl.)
    layer: jax.Array,  # i32 scalar: which layer's cache block to attend over
    n_head: int,
    interpret: bool = False,
    batch_major: bool = False,  # True: caches stacked (B, L, C, D)
    kv_rep: int = 1,  # q rows per kv row: kv row j serves q rows [j*r, j*r+r)
    k_rowscale: jax.Array | None = None,  # (B, L, C) f32 int8 row scales
    v_rowscale: jax.Array | None = None,  # (batch-major only)
    c_used: int | None = None,  # static: attend only over rows [0, c_used)
) -> jax.Array:
    """Single-query attention over ONE layer of a layer-stacked KV cache.

    Why the stacking matters: `decoder_step` scans over layers, and a kernel
    that takes per-layer (B, C, D) caches forces the scan to materialize a
    sliced copy of each layer's cache every step -- XLA cannot fuse a
    dynamic-slice into a custom call, so the compiled while-loop body grows
    kLoop fusions copying the full (B, C, D) slice to a staging buffer (seen
    in the optimized HLO as `constant_dynamic-slice_fusion` ops; at large-v2
    b32 with int8 cross-KV that is ~5 GB/step of pure copy traffic, larger
    than all useful HBM traffic combined). Here the caller passes the WHOLE
    (L, B, C, D) cache and the layer index; the index_map (scalar prefetch)
    picks the (layer, batch) block, so blocks stream straight from the cache
    buffer with zero staging copies.

    Returns (B, D) in v_cache.dtype (or q.dtype when v_cache is int8).

    `c_used` (static, 32-multiple) restricts the k/v block reads to cache
    rows [0, c_used): the CALLER must guarantee every pos < c_used (rows at
    or past c_used are never fetched, so no mask can save a violation).
    Per-row scale blocks stay whole-C (lane-dim DMA granularity) and are
    sliced in-kernel. Values outside [1, C] or misaligned fall back to C.

    Under an active kernel mesh (parallel/context) the call shard_maps over
    ("dp" kv rows, "tp" heads) instead of lowering to a replicated custom
    call (see _stacked_sharded).
    """
    mesh = _active_mesh()
    if mesh is not None:
        out = _stacked_sharded(
            mesh, q, k_cache, v_cache, pos, layer, n_head, interpret,
            batch_major, kv_rep, k_rowscale, v_rowscale, c_used,
        )
        if out is not None:
            return out
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    if batch_major:
        bk, l, c, d = k_cache.shape
    else:
        l, bk, c, d = k_cache.shape
    b = q.shape[0]
    if b != bk * kv_rep:
        raise ValueError(
            f"q batch {b} != kv batch {bk} * kv_rep {kv_rep}"
        )

    # Valid-prefix read: when the caller guarantees every pos < c_used, the
    # k/v BlockSpecs cover only the first c_used cache rows -- the DMA
    # engine never touches the dead tail (the decode step's dominant HBM
    # traffic is these cache streams; see docs/PERFORMANCE.md cache-length
    # probe: +128 dead rows = +1.0 ms/step at large-v2 b32). Blocks must
    # stay sublane-aligned (int8 needs 32-row multiples).
    cu = c if c_used is None else min(c_used, c)
    if cu != c and (cu <= 0 or cu % 32 != 0):
        cu = c

    # Batch rows per grid step: larger blocks amortize per-grid-step fixed
    # costs; bounded so the double-buffered k+v blocks (4*rb*c*d bytes) plus
    # kernel temporaries stay within the raised 64 MB VMEM budget below.
    # With kv_rep > 1 each kv block row already serves kv_rep q rows, so the
    # kv-row block (wb) is chosen and rb = wb * kv_rep.
    import os

    rb_cap = int(os.environ.get("WHISPER_TPU_DECODE_ROWS", "4"))
    if kv_rep == 1:
        rb = 1
        for cand in (8, 4, 2):  # rb=4 best on v5e (docs/PERFORMANCE.md)
            if (cand <= rb_cap and b % cand == 0
                    and 4 * cand * cu * d * k_cache.dtype.itemsize
                    < 40 * 2**20):
                rb = cand
                break
        wb = rb
    else:
        wb_cap = int(os.environ.get("WHISPER_TPU_CROSS_WB", "1"))
        wb = 1
        for cand in (4, 2):
            if (cand <= wb_cap and bk % cand == 0
                    and 4 * cand * cu * d * k_cache.dtype.itemsize
                    < 40 * 2**20):
                wb = cand
                break
        rb = wb * kv_rep

    q3 = q[:, None, :]  # (B, 1, D)
    pos_rows = jnp.broadcast_to(
        jnp.asarray(pos, jnp.int32).reshape(-1), (b,)
    )
    layer_arr = jnp.asarray(layer, jnp.int32).reshape((1,))

    # Grouped kv_rep path (one GEMM pair per shared-KV block): needs exact
    # bf16/int8 storage and the rep lanes' head bands to fit the 128-lane
    # MXU tile; falls back to the per-lane loop otherwise.
    gm = (
        _group_matrices(d, n_head, kv_rep)
        if kv_rep > 1
        and _bf16_exact(q.dtype, k_cache.dtype, v_cache.dtype)
        else None
    )

    kv_spec = pl.BlockSpec(
        (wb, 1, cu, d) if batch_major else (1, wb, cu, d),
        (lambda i, lr, pr: (i, lr[0], 0, 0)) if batch_major
        else (lambda i, lr, pr: (lr[0], i, 0, 0)),
        memory_space=pltpu.VMEM,
    )

    def const_spec(a):
        return pl.BlockSpec(a.shape, lambda i, lr, pr: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    scales = []
    if k_rowscale is not None:
        if not batch_major or kv_rep != 1:
            raise ValueError("row scales require batch_major and kv_rep=1")
        scales = [k_rowscale, v_rowscale]
        lb = 8 if l % 8 == 0 else l
        scale_spec = pl.BlockSpec(
            (rb, lb, c), lambda i, lr, pr: (i, lr[0] // lb, 0),
            memory_space=pltpu.VMEM,
        )
        consts = [
            jnp.asarray(_head_sum_matrix(d, n_head)),
            jnp.asarray(_head_sum_matrix_t(d, n_head)),
        ]
        kernel = functools.partial(
            _decode_attn_stacked_scaled_kernel, rb, lb, cu)
    elif gm is not None:
        sel, e_mul, et_mul, np_ = gm
        consts = [jnp.asarray(sel), jnp.asarray(e_mul), jnp.asarray(et_mul)]
        kernel = functools.partial(
            _decode_attn_stacked_group_kernel, rb, batch_major, kv_rep, np_)
    else:
        consts = [
            jnp.asarray(_head_sum_matrix(d, n_head)),
            jnp.asarray(_head_sum_matrix_t(d, n_head)),
        ]
        kernel = functools.partial(
            _decode_attn_stacked_kernel, rb, batch_major, kv_rep)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // rb,),
        in_specs=[
            pl.BlockSpec((rb, 1, d), lambda i, lr, pr: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
            *([scale_spec, scale_spec] if scales else []),
            *[const_spec(a) for a in consts],
        ],
        out_specs=pl.BlockSpec((rb, 1, d), lambda i, lr, pr: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, 1, d),
            q.dtype if v_cache.dtype in (jnp.int8, jnp.int4) else v_cache.dtype,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (bk if gm is not None else b) * cu * d * 2,
            bytes_accessed=2 * bk * cu * d * k_cache.dtype.itemsize,
            transcendentals=(bk if gm is not None else b) * cu * 128,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(layer_arr, pos_rows, q3, k_cache, v_cache, *scales, *consts)

    return out[:, 0, :]
