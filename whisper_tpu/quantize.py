"""Weight-only int8 quantization for bandwidth-bound decoding.

Autoregressive decoding at large-v2 streams ~3 GB of bf16 weights from HBM
every step; per-output-channel symmetric int8 halves that. Weights become
`QTensor(q: int8, scale: f32[out])` leaves; the model's linear ops dequantize
inside the matmul (the int8->bf16 convert fuses into the XLA GEMM, so HBM
sees only int8). Activations stay bf16/f32 -- this is weight-only
quantization, the standard accuracy-safe point for inference.

Use `quantize_params(params)` on a loaded checkpoint; everything downstream
(decoder_step, beam/greedy, Transcriber) works unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


class QTensor(NamedTuple):
    """Per-output-channel symmetric int8 weight: w ~= q * scale."""

    q: jax.Array  # int8, original shape
    scale: jax.Array  # f32, shape = original trailing dims


def quantize_tensor(w: jax.Array) -> QTensor:
    """Quantize over the INPUT axis (axis 0): one scale per output column,
    so dequantized matmul error does not mix across output channels."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QTensor(q, scale.astype(jnp.float32))


def dequantize(t: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    return (t.q.astype(jnp.float32) * t.scale).astype(dtype)


# Weight leaves worth quantizing: the large matmul weights of decoder blocks
# (the decode-step bandwidth) and optionally the encoder blocks.
_DECODER_KEYS = (
    "qkv_w", "attn_o_w", "cross_q_w", "cross_kv_w", "cross_o_w",
    "mlp1_w", "mlp2_w",
)


def quantize_params(
    params: Params,
    quantize_encoder: bool = False,
    keys: tuple = _DECODER_KEYS,
    bits: int = 8,
) -> Params:
    """Return params with selected block weights replaced by QTensors.

    bits=4 stores TPU-native packed S4 (half the weight stream again;
    per-output-channel scales only, so accuracy must clear the agreement
    gate before it can be a default)."""
    lim = float(2 ** (bits - 1) - 1)
    qdt = jnp.int4 if bits == 4 else jnp.int8

    def convert_blocks(blocks: Dict[str, jax.Array]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in blocks.items():
            if k in keys:
                # leaf shapes (L, in, out) or (L, in, p, out): quantize over
                # the input axis (axis 1), broadcast scale over it.
                w32 = v.astype(jnp.float32)
                absmax = jnp.max(jnp.abs(w32), axis=1)
                scale = jnp.where(absmax > 0, absmax / lim, 1.0)
                q = jnp.clip(
                    jnp.round(w32 / scale[:, None] if v.ndim == 3
                              else w32 / scale[:, None, :, :]),
                    -lim, lim,
                ).astype(qdt)
                out[k] = QTensor(q, scale.astype(jnp.float32))
            else:
                out[k] = v
        return out

    new = {
        "encoder": dict(params["encoder"]),
        "decoder": dict(params["decoder"]),
    }
    new["decoder"]["blocks"] = convert_blocks(params["decoder"]["blocks"])
    if quantize_encoder:
        new["encoder"]["blocks"] = convert_blocks(params["encoder"]["blocks"])
    return new
