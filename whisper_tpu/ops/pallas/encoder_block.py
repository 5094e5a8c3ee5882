"""Fused encoder sub-block kernels (the block-megakernel study).

Motivation (docs/PERFORMANCE.md round-2 encoder study): the bf16 encoder
sits at ~88% of the achievable-GEMM roofline and "a fused block-megakernel
is the only path past it". The dominant fusion XLA cannot do is holding the
(M, 4d) MLP hidden activations in VMEM across the two GEMMs: at large-v2
b64 shapes that intermediate is ~490 MB bf16 written + re-read per layer
(~31 GB per encoder pass). `fused_mlp_block` computes

    out = x + gelu_exact(layer_norm(x) @ w1 + b1) @ w2 + b2

with a (M-block, hidden-block) grid: the layernorm runs once per M-block
into VMEM scratch, each hidden block's GEMM1 + exact-erf gelu feeds its
GEMM2 partial product directly into an f32 accumulator, and the residual
add happens at the last hidden step -- the hidden activations never touch
HBM. Numerics: GEMM operands bf16 (same as the XLA path's inputs), both
accumulations f32 (preferred_element_type semantics), gelu in f32 with
exact erf -- matches the XLA op sequence to bf16 rounding of the ln/gelu
intermediates (the XLA path materializes those in bf16; the kernel keeps
them f32, strictly MORE accurate, so token-parity gates decide shipping).

New capability study -- no reference counterpart (whisper-burn runs Burn's
unfused module graph, src/model/mod.rs:298-303).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gelu_exact(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) with an in-kernel erf.

    Mosaic has no erf/erfc lowering, so erf uses Abramowitz & Stegun
    7.1.26 (abs err <= 1.5e-7 over the real line) -- ~50x below the bf16
    output rounding step (2^-8 relative), so bf16 results agree with the
    XLA exact-erf gelu except at exact rounding boundaries; the encoder
    token-agreement gate is the shipping criterion.

    Evaluated in the cancellation-free two-sided form
    (pe = erfc(|x|/sqrt2) = poly(t) * exp(-u^2) directly from A&S):
        x >= 0:  x * (1 - pe/2)
        x <  0:  x * pe/2
    so the negative tail never computes 1 - (1 - small). The deep tail
    (x < -5, |gelu| < 1e-6) keeps only absolute accuracy -- those values
    are below bf16 resolution of any downstream accumulation.
    """
    u = jnp.abs(x) * 0.7071067811865476
    t = 1.0 / (1.0 + 0.3275911 * u)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    pe = poly * jnp.exp(-u * u)  # erfc(u), u >= 0
    return jnp.where(x >= 0, x * (1.0 - 0.5 * pe), x * (0.5 * pe))


def _mlp_kernel(eps, x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, hn_ref, acc_ref):
    # grid (mi, hi), hi fastest. hn/acc scratch persist across the hi sweep.
    @pl.when(pl.program_id(1) == 0)
    def _ln_once():
        x = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        hn = (x - mu) * jax.lax.rsqrt(var + eps)
        hn = hn * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        # bf16 operand for the MXU: the XLA path also feeds ln output to the
        # GEMM as bf16, so this rounding matches it exactly.
        hn_ref[:] = hn.astype(hn_ref.dtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    t = jax.lax.dot_general(
        hn_ref[:], w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    t = _gelu_exact(t).astype(hn_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        t, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _emit():
        o_ref[:] = (
            x_ref[:].astype(jnp.float32) + acc_ref[:]
            + b2_ref[:].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _mlp_call(x, g, b, w1, b1, w2, b2, eps, block_m, block_h, interpret):
    m, d = x.shape
    h = w1.shape[1]
    bm = min(block_m, m)
    bh = block_h
    assert h % bh == 0, (h, bh)

    return pl.pallas_call(
        functools.partial(_mlp_kernel, eps),
        grid=(pl.cdiv(m, bm), h // bh),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln gamma
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # ln beta
            pl.BlockSpec((d, bh), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec((1, bh), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec((bh, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # b2
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, d), x.dtype),  # ln output (GEMM1 operand)
            pltpu.VMEM((bm, d), jnp.float32),  # GEMM2 accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * h,
            bytes_accessed=2 * (m * d * 3) + (m // bm + 1) * 2 * d * h * 2,
            transcendentals=m * h,  # exact-erf gelu
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(x, g.reshape(1, d), b.reshape(1, d), w1, b1.reshape(1, h), w2,
      b2.reshape(1, d))


def fused_mlp_block(
    x: jax.Array,  # (..., d) bf16
    ln_g: jax.Array,  # (d,)
    ln_b: jax.Array,  # (d,)
    w1: jax.Array,  # (d, h) bf16
    b1: jax.Array,  # (h,)
    w2: jax.Array,  # (h, d) bf16
    b2: jax.Array,  # (d,)
    eps: float = 1e-5,
    block_m: int = 1024,
    block_h: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x + gelu_exact(layer_norm(x) @ w1 + b1) @ w2 + b2, hidden in VMEM.

    Under an active kernel mesh (parallel/context) with a dp axis dividing
    the leading batch, the call shard_maps over "dp" with replicated
    weights (each device runs the kernel on its batch shard). Tensor
    parallelism never routes here: the MLP weights are tp-sharded and the
    model falls back to the XLA MLP, which GSPMD partitions Megatron-style
    (models/whisper._use_fused_mlp).
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    from ...parallel import context as pctx

    mesh = pctx.active_mesh()
    if mesh is not None and x.ndim >= 2:
        dp = pctx.dp_axis(mesh, x.shape[0])
        if dp is not None:
            from jax.sharding import PartitionSpec as P

            def inner(x, g, b, w1, b1, w2, b2):
                with pctx.kernel_mesh(None):
                    return fused_mlp_block(
                        x, g, b, w1, b1, w2, b2, eps=eps, block_m=block_m,
                        block_h=block_h, interpret=interpret,
                    )

            xspec = P(dp, *(None,) * (x.ndim - 1))
            return jax.shard_map(
                inner, mesh=mesh,
                in_specs=(xspec,) + (P(),) * 6, out_specs=xspec,
                check_vma=False,
            )(x, ln_g, ln_b, w1, b1, w2, b2)

    lead = x.shape[:-1]
    d = x.shape[-1]
    out = _mlp_call(x.reshape(-1, d), ln_g, ln_b, w1, b1, w2, b2, eps,
                    block_m, block_h, interpret)
    return out.reshape(*lead, d)
