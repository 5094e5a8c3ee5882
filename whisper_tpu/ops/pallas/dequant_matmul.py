"""Pallas int8 quantized matmul (decode-step weight streaming).

Why it exists: autoregressive decoding is weight-bandwidth-bound -- each step
streams every decoder weight from HBM. With weight-only int8 quantization
(quantize.py) HBM holds int8, but BOTH the XLA fused-convert path and a
Pallas dequantize-to-bf16 kernel are CONVERT-rate-bound, not DMA-bound:
measured on-chip at the qkv shape (1280x3840, M=24), XLA runs 17.7 us and
the bf16-dequant kernel 19.3 us against a ~6 us HBM roofline
(docs/PERFORMANCE.md round-2 log).

The fix is to never materialize bf16 weights at all: quantize the activation
row-dynamically to int8 (a (M,1) scale), feed the MXU an s8 x s8 -> s32
matmul (exact -- integer accumulate, no bf16 rounding), and fold
(row_scale x col_scale) into the f32 epilogue. Same shape runs in 4.3 us --
at the weight-stream roofline. Accuracy is W8A8-dynamic; the quantization
token-agreement gate (eval/agreement.py) must pass before this config ships,
and does: token-identical greedy+beam vs bf16 at large-v2 on the chip.

Shape contract: x (M, K) with small M (a decode step: M = batch x q_len),
wq (K, N) int8, scale (N,) f32 -> (M, N) in x.dtype. K, N multiples of 128
(true for every Whisper size). vmap (`beam_search_batched`) flattens the
window axis into M via a custom batching rule -- the default Pallas rule
cannot lower the blocked specs (same pattern as decode_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8a8_kernel(x_ref, wq_ref, ws_ref, o_ref, xq_ref, xs_ref):
    # Row-quantize the activation IN-KERNEL, ONCE, at grid step 0, into
    # VMEM scratch that persists across the (sequential) grid iterations.
    # Doing it as XLA ops outside costs two extra kernel launches per
    # matmul (~200/decode-step, more than the int8 GEMM saves); doing it
    # per grid step costs redundant VPU divides that dominate the tile.
    @pl.when(pl.program_id(0) == 0)
    def _quantize_once():
        x = x_ref[:].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        xs = jnp.where(absmax > 0, absmax * (1.0 / 127.0), 1.0)
        xq_ref[:] = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        xs_ref[:] = xs

    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (M, bn) s32, exact
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(
        o_ref.dtype
    )


def _pick_bn(n: int, block_n: int) -> int:
    # bn MUST divide n: the grid is n // bn and a remainder would leave
    # output columns unwritten (e.g. 3840 is not a multiple of 512)
    for cand in (512, 384, 256, 128):
        if cand <= block_n and n % cand == 0:
            return cand
    return 128


def _quantized_matmul_call(x, wq, scale, block_n, out_dtype, interpret):
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    m, k = x.shape
    _, n = wq.shape
    bn = _pick_bn(n, block_n)
    assert n % bn == 0, (n, bn)

    return pl.pallas_call(
        _w8a8_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            # scale as 2D: rank-1 vectors hit XLA/Mosaic tiling-layout
            # mismatches (T(1024) vs T(512)); 2D tiles block cleanly
            pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((m, k), jnp.int8),  # xq, written at grid step 0
            pltpu.VMEM((m, 1), jnp.float32),  # per-row scale
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=k * n + m * k + 4 * m * n,  # int8 weight stream
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wq, scale.reshape(1, n))


@functools.lru_cache(maxsize=8)
def _make_quantized_matmul(block_n: int, out_dtype, interpret: bool):
    @jax.custom_batching.custom_vmap
    def mm(x, wq, scale):
        return _quantized_matmul_call(x, wq, scale, block_n, out_dtype,
                                      interpret)

    @mm.def_vmap
    def _mm_vmap(axis_size, in_batched, x, wq, scale):
        xb, wb, sb = in_batched
        if wb or sb:
            # batched weights (e.g. per-layer stacked cross-KV prefill under
            # vmap): no grid flattening possible -- inner-vmap the plain XLA
            # dequant GEMM, which is correct for any batching pattern
            def xla_path(x_, wq_, scale_):
                y = jax.lax.dot_general(
                    x_.astype(jnp.bfloat16), wq_.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return (y * scale_).astype(out_dtype)

            out = jax.vmap(
                xla_path,
                in_axes=(0 if xb else None, 0 if wb else None,
                         0 if sb else None),
            )(x, wq, scale)
            return out, True
        x = jnp.asarray(x)
        if not xb:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        w_, b_, kk = x.shape
        out = mm(x.reshape(w_ * b_, kk), wq, scale)
        return out.reshape(w_, b_, -1), True

    return mm


def quantized_matmul(
    x: jax.Array,  # (M, K)
    wq: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) f32 per-output-channel weight scale
    block_n: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """(M, N) ~= x @ (wq * scale) via W8A8-dynamic int8 MXU. vmap-safe."""
    out_dtype = out_dtype or x.dtype
    return _make_quantized_matmul(block_n, jnp.dtype(out_dtype), interpret)(
        x, wq, scale
    )


# Backwards-compatible alias (round-2 intermediate name)
dequant_matmul = quantized_matmul


def _w8a8_big_kernel(x_ref, wq_ref, ws_ref, o_ref, xq_ref, xs_ref):
    # grid (mi, ni), ni fastest: quantize this M-block once when its first
    # N-block runs; the int8 activations + row scales persist in scratch
    # across the ni sweep (Mosaic re-fetches x only when the block index
    # changes, so the bf16 x block is read once per mi as well).
    @pl.when(pl.program_id(1) == 0)
    def _quantize_block():
        x = x_ref[:].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        inv = jnp.where(absmax > 0, 127.0 / absmax, 0.0)
        xq_ref[:] = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        xs_ref[:] = jnp.where(absmax > 0, absmax * (1.0 / 127.0), 1.0)

    acc = jax.lax.dot_general(
        xq_ref[:], wq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (bm, bn) s32, exact
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(
        o_ref.dtype
    )


def quantized_matmul_big(
    x: jax.Array,  # (M, K), M large (encoder shapes: M = batch * frames)
    wq: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) f32 per-output-channel weight scale
    block_m: int = 1024,
    block_n: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Large-M W8A8-dynamic int8 matmul for the MXU's 2x int8 rate.

    The small-M kernel above keeps the whole activation in VMEM; encoder
    GEMMs (M ~ 50k rows) tile M instead, quantizing each (bm, K) activation
    block in-kernel at its first N-step -- the fused quantize is what the
    XLA w8a8 path lacks (its separate quantize/dequant passes cost more
    than the s8 MXU saves; docs/PERFORMANCE.md int8 study).
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    out_dtype = out_dtype or x.dtype
    return _make_quantized_matmul_big(
        block_m, block_n, jnp.dtype(out_dtype), interpret
    )(x, wq, scale)


def _quantized_matmul_big_call(x, wq, scale, block_m, block_n, out_dtype,
                               interpret):
    m, k = x.shape
    _, n = wq.shape
    bn = _pick_bn(n, block_n)
    bm = min(block_m, m)

    return pl.pallas_call(
        _w8a8_big_kernel,
        grid=(pl.cdiv(m, bm), n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m // bm + 1) * k * n + 2 * m * k + 2 * m * n,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(x, wq, scale.reshape(1, n))


@functools.lru_cache(maxsize=8)
def _make_quantized_matmul_big(block_m: int, block_n: int, out_dtype,
                               interpret: bool):
    """vmap-safe wrapper for the large-M kernel.

    Without this, `jax.vmap` (e.g. init_cache's per-layer cross-KV
    projection with stacked weights) hits Pallas's default batching rule,
    which prepends a grid axis and breaks the program_id(1)==0
    quantize-once trigger -- silently wrong results. Batched WEIGHTS fall
    back to the plain XLA dequant GEMM (correct for any batching pattern);
    a batched activation alone flattens into the M axis.
    """

    @jax.custom_batching.custom_vmap
    def mm(x, wq, scale):
        return _quantized_matmul_big_call(
            x, wq, scale, block_m, block_n, out_dtype, interpret)

    @mm.def_vmap
    def _mm_vmap(axis_size, in_batched, x, wq, scale):
        xb, wb, sb = in_batched
        if wb or sb:
            def xla_path(x_, wq_, scale_):
                y = jax.lax.dot_general(
                    x_.astype(jnp.bfloat16), wq_.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return (y * scale_).astype(out_dtype)

            out = jax.vmap(
                xla_path,
                in_axes=(0 if xb else None, 0 if wb else None,
                         0 if sb else None),
            )(x, wq, scale)
            return out, True
        x = jnp.asarray(x)
        if not xb:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        w_, b_, kk = x.shape
        out = mm(x.reshape(w_ * b_, kk), wq, scale)
        return out.reshape(w_, b_, -1), True

    return mm
