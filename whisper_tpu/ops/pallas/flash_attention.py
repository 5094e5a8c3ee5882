"""Pallas TPU attention kernel (the "native kernel" layer, SURVEY.md C27).

Replaces the XLA matmul->softmax->matmul attention for full-sequence passes
(encoder self-attention, decoder prefill, cross-attention). XLA cannot fuse
across the two matmuls, so it round-trips the (B, H, S, S) f32 score tensor
through HBM twice -- at large-v2 encoder shapes (B=16, H=20, S=1504) that is
~5.4 GB of traffic per direction per layer. This kernel keeps scores in VMEM.

Design (S <= ~2048, head_dim = 64 for every Whisper size):
  * grid = (batch*heads, q blocks). Each program loads one q block
    (block_q, hd) plus the ENTIRE K and V for that head into VMEM
    (2 x S_pad x 64 x 2B ~= 0.4 MB at S_pad=1536) -- Whisper's fixed 1500-ctx
    means the full-K tile always fits, so no online-softmax running rescale
    is needed: plain rowwise softmax over a VMEM-resident f32 score tile
    (block_q x S_pad ~= 0.8 MB).
  * Padded key positions are masked with an iota compare against the true
    kv_len; causal masking (decoder prefill) reuses the same compare against
    the absolute q row index.
  * Matmuls run on the MXU with f32 accumulation (preferred_element_type),
    matching the XLA path's numerics to ~1e-5 (f32) / bf16 rounding.

The dual (d/h)^-0.25 q/k scaling of the reference (src/model/mod.rs:503-514)
is applied by the caller on q as a single (d/h)^-0.5 factor -- algebraically
identical, one multiply instead of two.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # large-negative instead of -inf: keeps masked softmax NaN-free


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, causal: bool,
                 block_q: int):
    """One (q block) x (full K/V) attention tile."""
    qi = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32)  # (block_q, hd)
    k = k_ref[0]  # (s_pad, hd)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (block_q, s_pad)

    s_pad = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_pad), 1)
    mask = col < kv_len
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, s_pad), 0)
        mask = mask & (col <= row + qi * block_q)
    s = jnp.where(mask, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = (p / denom).astype(v.dtype)

    o_ref[0] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "interpret")
)
def flash_attention(
    q: jax.Array,  # (B, H, Sq, hd) -- pre-scaled by (hd)^-0.5
    k: jax.Array,  # (B, H, Sk, hd)
    v: jax.Array,  # (B, H, Sk, hd)
    causal: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """VMEM-resident attention; returns (B, H, Sq, hd) in v.dtype."""
    b, h, sq, hd = q.shape
    sk = k.shape[2]

    block_q = min(block_q, _round_up(sq, 8))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))

    bh = b * h
    qp = qp.reshape(bh, sq_pad, hd)
    kp = kp.reshape(bh, sk_pad, hd)
    vp = vp.reshape(bh, sk_pad, hd)

    grid = (bh, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, kv_len=sk, causal=causal, block_q=block_q
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, hd), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_pad * sk_pad * hd,
            bytes_accessed=(qp.size + kp.size * (sq_pad // block_q) * 2
                            + qp.size) * qp.dtype.itemsize,
            transcendentals=bh * sq_pad * sk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    return out.reshape(b, h, sq_pad, hd)[:, :, :sq]


def _attn_bsd_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int,
                     causal: bool, block_q: int, n_group: int, hd: int,
                     fast_softmax: bool):
    """G heads x (q block x full K/V) attention on the NATURAL (S, G*hd)
    layout: per-head lane slices feed the same per-head dots as the legacy
    kernel -- no HBM head transpose ever happens.

    `fast_softmax` (non-causal only) removes two full-width VPU passes
    over the (block_q, sk_pad) f32 score tile -- on-chip they cost 0.86 +
    1.10 ms/layer-call of the kernel's 3.7 ms at large-v2 b64
    (tools/ablations/flash_softmax.py; docs/PERFORMANCE.md round-5 study):
      * no pad mask: padded K rows are ZERO, so their scores are exactly
        0.0 and their V rows contribute nothing to the numerator; their
        denominator mass is the closed-form n_pad * exp(-m), subtracted
        per row. Exact in f32 up to one subtraction rounding; m becomes
        max(valid scores, 0), still a valid softmax shift. Cancellation
        bound: rows whose best VALID logit is < ~-7 lose denominator
        precision (pad mass ~n_pad*eps_f32 vs valid mass e^max) --
        implausible for real attention rows, and n_pad <= 7 at Whisper
        shapes.
      * deferred normalization: the second dot consumes UNNORMALIZED
        exp(s - m) (bf16-rounded, same relative quantization as rounding
        p) and the division happens on the (block_q, G*hd) output --
        sk_pad/hd ~ 12x narrower.
    """
    qi = pl.program_id(2)

    # scores dot runs in the STORAGE dtype with f32 accumulation -- for the
    # production bf16 activations that is the same single-pass bf16 MXU op
    # (and the same numerics) as the XLA einsum path; upcasting the
    # operands to f32 costs multi-pass f32 MXU throughput for accuracy the
    # baseline path never had.
    q = q_ref[0]  # (block_q, G*hd)
    k = k_ref[0]  # (sk_pad, G*hd)
    v = v_ref[0]

    sk_pad = k.shape[0]
    fast = fast_softmax and not causal
    if not fast:
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk_pad), 1)
        mask = col < kv_len
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk_pad), 0)
            mask = mask & (col <= row + qi * block_q)
    n_pad = sk_pad - kv_len

    outs = []
    for g in range(n_group):
        qh = q[:, g * hd:(g + 1) * hd]
        kh = k[:, g * hd:(g + 1) * hd]
        s = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, sk_pad) f32
        vh = v[:, g * hd:(g + 1) * hd]
        if fast:
            m = jnp.max(s, axis=1, keepdims=True)  # >= 0 (pad cols are 0)
            e = jnp.exp(s - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            if n_pad:
                denom = denom - n_pad * jnp.exp(-m)
            o = jax.lax.dot_general(
                e.astype(v.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(o / denom)
            continue
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        p = (p / denom).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "causal", "block_q", "interpret")
)
def _attention_bsd(q, k, v, n_head: int, causal: bool, block_q: int,
                   interpret: bool):
    import os

    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // n_head
    # WHISPER_TPU_FLASH_SOFTMAX=fast elides the pad-mask and normalization
    # VPU passes (see _attn_bsd_kernel). Default LEGACY: the round-5 study
    # measured the standalone kernel -2 ms/layer-call but the PRODUCTION
    # encoder only -1% (306.6 -> 303.4 ms at b32) and end-to-end bench
    # neutral -- in situ the softmax VPU work overlaps the pipelined
    # DMAs/adjacent ops, so the numerics tweak buys nothing real
    # (docs/PERFORMANCE.md round-5 flash-softmax study).
    fast_softmax = os.environ.get(
        "WHISPER_TPU_FLASH_SOFTMAX", "legacy") == "fast"
    # G heads per program: lane-dim G*hd stays 128-aligned (hd = 64 for
    # every Whisper size), halving per-program fixed cost vs one head.
    n_group = 2 if n_head % 2 == 0 and 2 * hd in (128, 256) else 1

    block_q = min(block_q, _round_up(sq, 8))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, 8)

    qp = jnp.pad(q, ((0, 0), (0, sq_pad - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, sk_pad - sk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, sk_pad - sk), (0, 0)))

    gd = n_group * hd
    # grid: qi fastest -> the full-K/V block (bi, 0, hi) stays VMEM-resident
    # across a head-group's whole q sweep
    grid = (b, n_head // n_group, sq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attn_bsd_kernel, kv_len=sk, causal=causal, block_q=block_q,
            n_group=n_group, hd=hd, fast_softmax=fast_softmax,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, gd), lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, gd), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_pad, gd), lambda bi, hi, qi: (bi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, gd),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, d), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_head * sq_pad * sk_pad * hd,
            bytes_accessed=2 * (qp.size + kp.size + vp.size)
            * qp.dtype.itemsize,
            transcendentals=b * n_head * sq_pad * sk_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq]


def _attention_bhsd_sharded(mesh, q, k, v, n_head, causal, interpret):
    """shard_map composition of `attention_bhsd` over an active kernel mesh.

    GSPMD treats the pallas_call as an opaque custom call it cannot
    partition (it would all-gather the operands and run the kernel
    replicated on every device); here each device instead runs the SAME
    kernel on its (batch-shard, head-shard) slice. Heads are contiguous
    lane slices of d and the Megatron TP sharding keeps whole heads per
    "tp" shard (parallel/sharding.py), so the per-shard kernel is simply
    the full kernel at n_head/tp heads. Returns None when neither mesh
    axis cleanly divides the operands (caller falls through unsharded).
    """
    from jax.sharding import PartitionSpec as P

    from ...parallel import context as pctx

    dp = pctx.dp_axis(mesh, q.shape[0])
    tp = pctx.tp_axis(mesh, n_head, q.shape[-1])
    if dp is None and tp is None:
        return None
    tp_n = pctx.tp_size(mesh) if tp else 1
    spec = P(dp, None, tp)

    def inner(q, k, v):
        with pctx.kernel_mesh(None):
            return attention_bhsd(
                q, k, v, n_head // tp_n, causal=causal, interpret=interpret
            )

    return jax.shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def attention_bhsd(
    q: jax.Array,  # (B, S, d) unscaled
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    causal: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for models.whisper.qkv_attention on the (B, S, d) layout.

    Default path: the natural-layout kernel (`_attention_bsd`) -- heads are
    LANE SLICES of the (B, S, d) activation, so the (B,S,d)->(B,H,S,hd)
    HBM transposes of the legacy path (4 x ~122 MB per large-v2 b64 layer
    call) never happen, and G=2 heads per program keep the block lane dim
    at 128 (see docs/PERFORMANCE.md round-4 flash rework for on-chip A/B).
    WHISPER_TPU_FLASH_IMPL=legacy restores the transposing kernel.

    Under an active kernel mesh (parallel/context.kernel_mesh) the call is
    shard_mapped over ("dp" batch, "tp" heads) so tensor/data-parallel
    programs keep the Pallas path instead of a replicated custom call.
    """
    import os

    from ...parallel import context as pctx

    mesh = pctx.active_mesh()
    if mesh is not None:
        out = _attention_bhsd_sharded(mesh, q, k, v, n_head, causal, interpret)
        if out is not None:
            return out

    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic kernels only compile on TPU
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // n_head
    scale = float(hd) ** -0.5  # == ((d/h)^-0.25)^2 applied once

    if os.environ.get("WHISPER_TPU_FLASH_IMPL", "bsd") != "legacy":
        return _attention_bsd(
            (q * scale), k, v, n_head, causal,
            int(os.environ.get("WHISPER_TPU_FLASH_BLOCK_Q", "768")),
            interpret)

    qh = (q * scale).reshape(b, sq, n_head, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, n_head, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, n_head, hd).transpose(0, 2, 1, 3)
    o = flash_attention(qh, kh, vh, causal=causal, interpret=interpret)
    return o.transpose(0, 2, 1, 3).reshape(b, sq, d)
