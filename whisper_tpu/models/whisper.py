"""Whisper encoder-decoder as pure JAX functions over a parameter pytree.

Capability parity with the reference model (whisper-burn `src/model/mod.rs`):
conv stem + encoder blocks + ln_post (`AudioEncoder::forward`,
src/model/mod.rs:228-260), token/positional embedding + decoder blocks + tied
output head (`TextDecoder::forward`, src/model/mod.rs:131-157), pre-LN residual
blocks (src/model/mod.rs:298-303,344-350), and the dual q/k scaling
`(n_state/n_head)^-0.25` attention (`qkv_attention`, src/model/mod.rs:493-533)
with a bias-free K projection (src/model/mod.rs:402-404).

TPU-first design (NOT a port of the Burn module graph):
  * Parameters are a pytree of plain arrays with all transformer blocks
    STACKED on a leading layer axis; forward passes `lax.scan` over layers so
    a 32-layer model traces once per block, not 32 times.
  * Q/K/V projections are fused into one (d, 3, d) matmul at load time (K has
    no bias; its bias slot is zero, so results are bit-identical). Cross
    attention fuses K/V into (d, 2, d). The projection axis stays separate so
    TP sharding of the head axis never crosses the q|k|v boundary.
  * Convolutions run in NHC (channels-last) layout, the native TPU layout.
  * Incremental decoding uses a fixed-shape KV cache (new capability -- the
    reference recomputes the full sequence every beam step,
    src/transcribe.rs:270) so the decode step is O(seq) instead of O(seq^2).
  * All matmuls request `preferred_element_type=float32` so bf16 params still
    accumulate in f32 on the MXU.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import WhisperConfig, active_knobs, current_knobs
from ..quantize import QTensor


def _with_knobs(fn):
    """Entry-point decorator: activate the config's kernel knobs
    (config.KernelKnobs; WHISPER_TPU_* env vars override) for the trace, so
    leaf helpers with no cfg parameter (_matmul, _use_fused_mlp) read the
    caller's config instead of bare env defaults."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        cfg = kwargs.get("cfg")
        if cfg is None:
            for a in args:
                if isinstance(a, WhisperConfig):
                    cfg = a
                    break
        with active_knobs(cfg.knobs if cfg is not None else None):
            return fn(*args, **kwargs)

    return wrapper

Params = Dict[str, Any]

NEG_INF = float("-inf")


# ----------------------------------------------------------------------------
# Parameter initialization (random; checkpoints overwrite these).
# ----------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: WhisperConfig, dtype=jnp.float32) -> Params:
    """Random-normal parameters in the canonical pytree layout.

    Shapes (L = layers, d = n_state, V = vocab):
      encoder:
        conv1_w (3, n_mels, d)  conv1_b (d,)      # NHC/HIO layout
        conv2_w (3, d, d)       conv2_b (d,)
        pos_emb (n_audio_ctx, d)
        blocks: attn_ln_{g,b} (L,d); qkv_w (L,d,3,d); qkv_b (L,3,d);
                attn_o_w (L,d,d); attn_o_b (L,d); mlp_ln_{g,b} (L,d);
                mlp1_w (L,d,4d); mlp1_b (L,4d); mlp2_w (L,4d,d); mlp2_b (L,d)
        ln_post_{g,b} (d,)
      decoder:
        tok_emb (V, d); pos_emb (n_text_ctx, d)
        blocks: as encoder plus cross_ln_{g,b} (L,d); cross_q_w (L,d,d);
                cross_q_b (L,d); cross_kv_w (L,d,2,d); cross_kv_b (L,2,d);
                cross_o_w (L,d,d); cross_o_b (L,d)
        ln_{g,b} (d,)
    """
    enc_cfg, dec_cfg = cfg.audio_encoder_config, cfg.text_decoder_config
    d = cfg.n_state
    keys = jax.random.split(key, 8)

    def normal(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    def block_params(k, n_layer, cross: bool):
        ks = jax.random.split(k, 16)
        p = {
            "attn_ln_g": jnp.ones((n_layer, d), dtype),
            "attn_ln_b": jnp.zeros((n_layer, d), dtype),
            "qkv_w": normal(ks[0], (n_layer, d, 3, d)),
            "qkv_b": jnp.zeros((n_layer, 3, d), dtype),
            "attn_o_w": normal(ks[1], (n_layer, d, d)),
            "attn_o_b": jnp.zeros((n_layer, d), dtype),
            "mlp_ln_g": jnp.ones((n_layer, d), dtype),
            "mlp_ln_b": jnp.zeros((n_layer, d), dtype),
            "mlp1_w": normal(ks[2], (n_layer, d, 4 * d)),
            "mlp1_b": jnp.zeros((n_layer, 4 * d), dtype),
            "mlp2_w": normal(ks[3], (n_layer, 4 * d, d)),
            "mlp2_b": jnp.zeros((n_layer, d), dtype),
        }
        if cross:
            p.update(
                {
                    "cross_ln_g": jnp.ones((n_layer, d), dtype),
                    "cross_ln_b": jnp.zeros((n_layer, d), dtype),
                    "cross_q_w": normal(ks[4], (n_layer, d, d)),
                    "cross_q_b": jnp.zeros((n_layer, d), dtype),
                    "cross_kv_w": normal(ks[5], (n_layer, d, 2, d)),
                    "cross_kv_b": jnp.zeros((n_layer, 2, d), dtype),
                    "cross_o_w": normal(ks[6], (n_layer, d, d)),
                    "cross_o_b": jnp.zeros((n_layer, d), dtype),
                }
            )
        return p

    return {
        "encoder": {
            "conv1_w": normal(keys[0], (3, enc_cfg.n_mels, d)),
            "conv1_b": jnp.zeros((d,), dtype),
            "conv2_w": normal(keys[1], (3, d, d)),
            "conv2_b": jnp.zeros((d,), dtype),
            "pos_emb": normal(keys[2], (enc_cfg.n_audio_ctx, d), 1.0),
            "blocks": block_params(keys[3], enc_cfg.n_audio_layer, cross=False),
            "ln_post_g": jnp.ones((d,), dtype),
            "ln_post_b": jnp.zeros((d,), dtype),
        },
        "decoder": {
            "tok_emb": normal(keys[4], (dec_cfg.n_vocab, d), 1.0),
            "pos_emb": normal(keys[5], (dec_cfg.n_text_ctx, d), 1.0),
            "blocks": block_params(keys[6], dec_cfg.n_text_layer, cross=True),
            "ln_g": jnp.ones((d,), dtype),
            "ln_b": jnp.zeros((d,), dtype),
        },
    }


# ----------------------------------------------------------------------------
# Primitive ops
# ----------------------------------------------------------------------------


def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


def _matmul(x: jax.Array, w) -> jax.Array:
    """x (..., d) @ w (d, ...); w may be an int8 QTensor (weight-only quant).

    QTensor impl selection (`config.KernelKnobs.int8_impl` via the
    enclosing entry point's `active_knobs`; WHISPER_TPU_INT8_IMPL
    overrides; read at trace time):
      * "xla" (default): int8 weights with the convert fused into the XLA
        GEMM -- measured fastest end-to-end at BOTH decode (small M; w8a8's
        extra ops outweigh the MXU saving) and encoder shapes (m=24k:
        w8a8 measured 461 ms vs 414 ms bf16 at large-v2 b32 -- the dynamic
        activation quant + s32 epilogue costs more than the s8 MXU saves
        through XLA dots; docs/PERFORMANCE.md);
      * "auto": w8a8 for m >= 4096, fused-convert "xla" below;
      * "w8a8": dynamic per-row int8 activations + XLA s8 x s8 -> s32 dot;
      * "pallas": the Pallas W8A8 kernel (ops/pallas/dequant_matmul.py)."""
    if isinstance(w, QTensor):
        impl = current_knobs().int8_impl
        q = w.q
        k = q.shape[0]
        n = 1
        for s in q.shape[1:]:
            n *= s
        lead = x.shape[:-1]
        m = 1
        for s in lead:
            m *= s
        aligned = k % 128 == 0 and n % 128 == 0
        small = m <= 1024 and aligned
        if impl == "auto":
            impl = "w8a8" if m >= 4096 else "xla"
            small = aligned
        if impl == "pallas" and jax.default_backend() == "tpu" and small:
            from ..ops.pallas.dequant_matmul import quantized_matmul

            y = quantized_matmul(
                x.reshape(m, k), q.reshape(k, n), w.scale.reshape(n),
                out_dtype=x.dtype,
            )
            return y.reshape(*lead, *q.shape[1:])
        if (impl == "pallas" and jax.default_backend() == "tpu"
                and aligned and m > 1024):
            # encoder-shaped GEMMs: tiled large-M W8A8 with fused in-kernel
            # activation quantization (the separate XLA quantize passes are
            # what made the "w8a8" impl lose; see dequant_matmul.py)
            from ..ops.pallas.dequant_matmul import quantized_matmul_big

            y = quantized_matmul_big(
                x.reshape(m, k), q.reshape(k, n), w.scale.reshape(n),
                out_dtype=x.dtype,
            )
            return y.reshape(*lead, *q.shape[1:])
        if impl == "w8a8" and small:
            x32 = x.reshape(m, k).astype(jnp.float32)
            absmax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
            xs = jnp.where(absmax > 0, absmax * (1.0 / 127.0), 1.0)
            xq = jnp.clip(jnp.round(x32 / xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                xq, q.reshape(k, n), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (acc.astype(jnp.float32) * xs * w.scale.reshape(n)).astype(
                x.dtype
            )
            return y.reshape(*lead, *q.shape[1:])
        y = jax.lax.dot_general(
            x, q.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * w.scale).astype(x.dtype)
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    y = _matmul(x, w)
    if b is not None:
        y = y + b
    return y


def _qkv_proj(x: jax.Array, w, b: jax.Array):
    """Fused QKV projection: x (..., d) @ w (d, 3, d) + b (3, d) -> q, k, v.

    One MXU GEMM (contraction over d, 3d output columns). The projection axis
    is kept as a SEPARATE dim (3, d) rather than flattened (3d,) so tensor
    parallelism can shard the trailing head axis without crossing the q|k|v
    boundary (see whisper_tpu.parallel.sharding).
    """
    y = _matmul(x, w) + b
    return y[..., 0, :], y[..., 1, :], y[..., 2, :]


def _kv_proj(x: jax.Array, w, b: jax.Array):
    """Fused KV projection: x (..., d) @ w (d, 2, d) + b (2, d) -> k, v."""
    y = _matmul(x, w) + b
    return y[..., 0, :], y[..., 1, :]


def qkv_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    n_head: int,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention over (B, S, d) projections.

    Matches the reference `qkv_attention` (src/model/mod.rs:493-533): scale
    (d/h)^-0.25 applied to BOTH q and k, additive mask, softmax over keys.
    Softmax runs in f32 regardless of input dtype.
    """
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // n_head
    scale = (d / n_head) ** -0.25

    q = (q * scale).reshape(b, sq, n_head, hd)
    k = (k * scale).reshape(b, sk, n_head, hd)
    v = v.reshape(b, sk, n_head, hd)

    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype).reshape(b, sq, d)


def causal_mask(sq: int, sk: int, offset: int = 0, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask (1, 1, sq, sk): query i attends keys j <= i+offset.

    Parity with `attn_decoder_mask` (src/model/mod.rs:535-544) sliced to
    [0..sq, 0..sk] (src/model/mod.rs:522-524).
    """
    i = jnp.arange(sq)[:, None]
    j = jnp.arange(sk)[None, :]
    m = jnp.where(j > i + offset, NEG_INF, 0.0).astype(dtype)
    return m[None, None]


# ----------------------------------------------------------------------------
# Encoder
# ----------------------------------------------------------------------------


def _conv1d_nhc(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """1-D conv, x (B, T, C_in), w (K, C_in, C_out), 'same'-style padding=1."""
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=((1, 1),),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + b


def _attention(q, k, v, n_head, impl, causal=False, mask=None):
    """Dispatch between the XLA einsum path and the Pallas flash kernel."""
    if impl == "flash":
        from ..ops.pallas.flash_attention import attention_bhsd

        return attention_bhsd(q, k, v, n_head, causal=causal)
    return qkv_attention(q, k, v, n_head, mask)


def _use_fused_mlp(w1, impl: str) -> bool:
    """True when the encoder MLP should run as the fused Pallas sub-block
    (ops/pallas/encoder_block.py): flash (inference fast-path) config on a
    real TPU with plain bf16 weights and kernel-aligned shapes. Training
    (impl="xla" -- neither Pallas kernel has a VJP) and the CPU test path
    never route here; WHISPER_TPU_ENC_MLP=xla forces the XLA ops for A/B.
    Measured 11.0 -> 9.6 ms/layer at large-v2 b64 (docs/PERFORMANCE.md
    round-4 fused-MLP study)."""
    import os

    from ..quantize import QTensor

    if impl != "flash" or isinstance(w1, QTensor):
        return False
    if current_knobs().encoder_mlp == "xla":
        return False
    from ..parallel import context as pctx

    if pctx.tp_size() > 1:
        # The MLP weights are tp-sharded (Megatron column/row layout); the
        # fused kernel has no tp decomposition, so let GSPMD partition the
        # plain XLA MLP instead.
        return False
    d, h = w1.shape[-2], w1.shape[-1]
    return (jax.default_backend() == "tpu" and d % 128 == 0
            and h % 512 == 0)


def _encoder_block(x: jax.Array, p: Dict[str, jax.Array], n_head: int, eps: float,
                   impl: str = "xla") -> jax.Array:
    """Pre-LN residual encoder block (src/model/mod.rs:298-303)."""
    h = layer_norm(x, p["attn_ln_g"], p["attn_ln_b"], eps)
    q, k, v = _qkv_proj(h, p["qkv_w"], p["qkv_b"])
    x = x + _linear(_attention(q, k, v, n_head, impl), p["attn_o_w"], p["attn_o_b"])
    if _use_fused_mlp(p["mlp1_w"], impl):
        from ..ops.pallas.encoder_block import fused_mlp_block

        return fused_mlp_block(
            x, p["mlp_ln_g"], p["mlp_ln_b"], p["mlp1_w"], p["mlp1_b"],
            p["mlp2_w"], p["mlp2_b"], eps=eps,
            block_h=1024 if p["mlp1_w"].shape[-1] % 1024 == 0 else 512,
        )
    h = layer_norm(x, p["mlp_ln_g"], p["mlp_ln_b"], eps)
    h = _linear(jax.nn.gelu(_linear(h, p["mlp1_w"], p["mlp1_b"]), approximate=False),
                p["mlp2_w"], p["mlp2_b"])
    return x + h


@_with_knobs
def encoder_forward(
    params: Params, mel: jax.Array, cfg: WhisperConfig, remat: bool = False
) -> jax.Array:
    """AudioEncoder forward: mel (B, n_mels, T) -> (B, ceil(T/2), d).

    Parity: `AudioEncoder::forward` (src/model/mod.rs:228-260). The positional
    embedding is sliced to the actual post-conv length (src/model/mod.rs:246-252)
    so inputs shorter than n_audio_ctx work.
    """
    enc = params["encoder"]
    enc_cfg = cfg.audio_encoder_config
    if mel.shape[1] != enc_cfg.n_mels:
        raise ValueError(f"Audio mel spectrum size must be {enc_cfg.n_mels}.")
    if mel.shape[2] > enc_cfg.n_audio_ctx:
        raise ValueError(
            f"Audio length {mel.shape[2]} cannot exceed {enc_cfg.n_audio_ctx}."
        )

    x = jnp.swapaxes(mel, 1, 2).astype(enc["conv1_w"].dtype)  # (B, T, n_mels)
    x = jax.nn.gelu(_conv1d_nhc(x, enc["conv1_w"], enc["conv1_b"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d_nhc(x, enc["conv2_w"], enc["conv2_b"], 2), approximate=False)

    x = x + enc["pos_emb"][: x.shape[1]]

    n_head, eps = enc_cfg.n_audio_head, cfg.ln_eps
    block = _encoder_block
    if remat:  # trade FLOPs for HBM under reverse-mode AD (training)
        block = jax.checkpoint(block, static_argnums=(2, 3, 4))

    def body(h, p):
        return block(h, p, n_head, eps, cfg.attention), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_post_g"], enc["ln_post_b"], eps)


# ----------------------------------------------------------------------------
# Decoder: full-sequence forward (teacher-forcing / parity path)
# ----------------------------------------------------------------------------


def _decoder_block(
    x: jax.Array,
    p: Dict[str, jax.Array],
    xa: jax.Array,
    mask: jax.Array,
    n_head: int,
    eps: float,
    impl: str = "xla",
) -> jax.Array:
    """Pre-LN residual decoder block (src/model/mod.rs:344-350)."""
    h = layer_norm(x, p["attn_ln_g"], p["attn_ln_b"], eps)
    q, k, v = _qkv_proj(h, p["qkv_w"], p["qkv_b"])
    x = x + _linear(_attention(q, k, v, n_head, impl, causal=True, mask=mask),
                    p["attn_o_w"], p["attn_o_b"])

    h = layer_norm(x, p["cross_ln_g"], p["cross_ln_b"], eps)
    q = _linear(h, p["cross_q_w"], p["cross_q_b"])
    ck, cv = _kv_proj(xa, p["cross_kv_w"], p["cross_kv_b"])
    x = x + _linear(_attention(q, ck, cv, n_head, impl), p["cross_o_w"], p["cross_o_b"])

    h = layer_norm(x, p["mlp_ln_g"], p["mlp_ln_b"], eps)
    h = _linear(jax.nn.gelu(_linear(h, p["mlp1_w"], p["mlp1_b"]), approximate=False),
                p["mlp2_w"], p["mlp2_b"])
    return x + h


@_with_knobs
def decoder_forward(
    params: Params,
    tokens: jax.Array,
    enc_out: jax.Array,
    cfg: WhisperConfig,
    remat: bool = False,
) -> jax.Array:
    """TextDecoder forward: tokens (B, S) + enc_out (B, Sa, d) -> logits (B, S, V).

    Parity: `TextDecoder::forward` (src/model/mod.rs:131-157): token embedding
    plus positional embedding sliced to S, N causal-masked blocks, final LN,
    tied-embedding output head (logits = x @ tok_emb.T, src/model/mod.rs:156).
    """
    dec = params["decoder"]
    dec_cfg = cfg.text_decoder_config
    seq_len = tokens.shape[1]
    if seq_len > dec_cfg.n_text_ctx:
        raise ValueError(
            f"Token sequence length {seq_len} must not exceed {dec_cfg.n_text_ctx}."
        )

    x = dec["tok_emb"][tokens] + dec["pos_emb"][:seq_len]
    mask = causal_mask(seq_len, seq_len)
    n_head, eps = dec_cfg.n_text_head, cfg.ln_eps
    block = _decoder_block
    if remat:
        block = jax.checkpoint(block, static_argnums=(4, 5, 6))

    def body(h, p):
        return block(h, p, enc_out, mask, n_head, eps, cfg.attention), None

    x, _ = jax.lax.scan(body, x, dec["blocks"])
    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps)
    return jax.lax.dot_general(
        x, dec["tok_emb"], (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@_with_knobs
def whisper_forward(
    params: Params,
    mel: jax.Array,
    tokens: jax.Array,
    cfg: WhisperConfig,
    remat: bool = False,
) -> jax.Array:
    """`Whisper::forward` (src/model/mod.rs:48-50): decoder(tokens, encoder(mel))."""
    enc = encoder_forward(params, mel, cfg, remat=remat)
    return decoder_forward(params, tokens, enc, cfg, remat=remat)


# ----------------------------------------------------------------------------
# Incremental decoding with KV cache (new capability vs the reference's
# full-sequence recompute per beam step, src/transcribe.rs:270).
# ----------------------------------------------------------------------------


class DecoderCache(NamedTuple):
    """Fixed-shape decoder state for `lax.scan`/`while_loop` decoding.

    self_k/self_v: (B, L, cache_len, d), BATCH-major -- self-attention KV,
        written at position `pos` each step; batch-major so beam reshuffles
        gather contiguous per-lane slabs.
    cross_k/cross_v: (L, W, Sa, d) -- cross-attention KV, computed once per
        encoded window; W = number of windows, which for beam search is
        B // beam_size (lanes of one window share one cross-KV copy).
    """

    self_k: jax.Array
    self_v: jax.Array
    cross_k: jax.Array
    cross_v: jax.Array


def _q8_rows(x: jax.Array, qdt=jnp.int8) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8/int4: x (..., d) -> (q (..., d), scale (...)).

    One scale per cache ROW (position): rows are written once and never mix,
    so per-row scaling adds no cross-position error, and the decode kernel
    applies K's scale to its score row and V's to its softmax weight -- both
    O(C) VPU multiplies (see ops/pallas/decode_attention._attend). The scale
    array drops the trailing axis ((B, L, C), not (..., 1)): Mosaic DMA
    slices reject size-1 lane dims, and a lane-major (..., C) layout keeps
    both the permute-DMA slabs and the kernel's (rb, 1, C) blocks aligned.
    qdt=int4 stores packed S4 (per-row scales keep the 4-bit error tight).
    """
    lim = 7.0 if jnp.dtype(qdt) == jnp.dtype(jnp.int4) else 127.0
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(a > 0, a / lim, 1.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -lim, lim
    ).astype(qdt)
    return q, scale[..., 0]


@_with_knobs
def init_cache(
    params: Params,
    enc_out: jax.Array,
    cfg: WhisperConfig,
    batch: Optional[int] = None,
    cache_len: Optional[int] = None,
    kv_quant: bool = False,
    self_quant: bool = False,
) -> DecoderCache:
    """Allocate the self-attn cache and precompute cross-attn K/V from enc_out.

    If `batch` is a multiple R of enc_out's batch, each window gets R decode
    lanes sharing ONE cross-KV copy (the beam-search case; see below).

    `cache_len` caps the self-attn cache length (default n_text_ctx). Decoders
    that know their maximum sequence length (prompt + max_depth) pass a tight
    bound: every decode step streams the whole k/v cache, so at large-v2
    shrinking C from 448 to 128 removes ~0.8 GB of dead HBM traffic per step.

    Cross caches are layer-major (L, B, Sa, d); the SELF caches are
    BATCH-major (B, L, C, d) so the beam reshuffle gathers whole contiguous
    (L*C*d) per-lane slabs -- XLA's gather over a non-contiguous lane axis
    measured ~4.5x off the memory roofline, while contiguous-slab gathers
    run at copy speed (docs/PERFORMANCE.md). The Pallas decode kernel
    consumes either stacking via its index_map (no per-step relayout).
    """
    dec = params["decoder"]
    dec_cfg = cfg.text_decoder_config
    L = dec_cfg.n_text_layer
    d = dec_cfg.n_text_state
    b_enc, sa, _ = enc_out.shape
    b = batch or b_enc
    dtype = dec["tok_emb"].dtype

    def cross_kv_layer(p, xa):
        k, v = _kv_proj(xa, p["cross_kv_w"], p["cross_kv_b"])
        return k, v

    # vmap over the stacked layer axis of the block params.
    blocks = dec["blocks"]
    cross_p = {k: blocks[k] for k in ("cross_kv_w", "cross_kv_b")}
    ck, cv = jax.vmap(cross_kv_layer, in_axes=(0, None))(cross_p, enc_out.astype(dtype))
    if b != b_enc and b % b_enc != 0:
        raise ValueError(
            f"decode batch {b} must be a multiple of enc_out batch {b_enc}"
        )
    # b > b_enc (the beam case: K decode lanes per window) keeps the cross
    # cache at ONE copy per window, (L, b_enc, Sa, d); the attention paths
    # infer rep = b // b_enc and map lane i -> window i // rep. This replaces
    # the reference's `encoder_output.repeat` per step (src/transcribe.rs:270)
    # and, unlike a materialized broadcast, removes the K-fold duplicate
    # cross-cache reads that dominated beam HBM traffic (docs/PERFORMANCE.md).

    if kv_quant:
        # int8/int4 cross-KV (opt-in): the cross cache is the largest
        # per-step HBM stream at large batch (~3 GB/step at large-v2 b24 in
        # bf16). One scale per (layer, channel); K's scale folds into the
        # query and V's applies once to the attention output, so
        # dequantization is free in the decode path (see _cached_attention /
        # decode_attention). kv_quant="int4" stores TPU-native packed S4
        # (~2x the quantization error, gated by the same token-agreement
        # check; the measured speed gain is small -- see docs/PERFORMANCE.md
        # on the decode kernels' DMA behavior).
        from ..quantize import QTensor

        if kv_quant not in (True, "int8", "int4"):
            raise ValueError(f"unsupported kv_quant: {kv_quant!r}")
        bits = 4 if kv_quant == "int4" else 8
        lim = float(2 ** (bits - 1) - 1)
        qdt = jnp.int4 if bits == 4 else jnp.int8

        def qn(x):
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2))
            scale = jnp.where(absmax > 0, absmax / lim, 1.0)  # (L, d)
            qv = jnp.clip(
                jnp.round(x.astype(jnp.float32) / scale[:, None, None, :]),
                -lim, lim,
            ).astype(qdt)
            return QTensor(qv, scale.astype(jnp.float32))

        ck, cv = qn(ck), qn(cv)

    c = cache_len if cache_len is not None else dec_cfg.n_text_ctx
    c = min(c, dec_cfg.n_text_ctx)
    if self_quant:
        # int8/int4 self-KV with per-row scales (B, L, C): halves (or
        # quarters) the self cache stream AND the beam-reshuffle permute
        # traffic. self_quant="int4" stores TPU-native packed S4; _q8_rows
        # picks its limit from this dtype at append time.
        from ..quantize import QTensor

        if self_quant not in (True, "int8", "int4"):
            raise ValueError(f"unsupported self_quant: {self_quant!r}")
        sdt = jnp.int4 if self_quant == "int4" else jnp.int8
        self_k = QTensor(
            jnp.zeros((b, L, c, d), sdt),
            jnp.ones((b, L, c), jnp.float32),
        )
        self_v = QTensor(
            jnp.zeros((b, L, c, d), sdt),
            jnp.ones((b, L, c), jnp.float32),
        )
    else:
        self_k = jnp.zeros((b, L, c, d), dtype)
        self_v = jnp.zeros((b, L, c, d), dtype)
    return DecoderCache(self_k, self_v, ck, cv)


def _cached_attention(
    q: jax.Array,  # (B, S, d) -- S query positions
    k_cache: jax.Array,  # (B, C, d) flat cache
    v_cache: jax.Array,
    last_visible: jax.Array,  # (S,) highest visible key index per query
    n_head: int,
    impl: str,
) -> jax.Array:
    """Attention of S new queries against the fixed-size flat cache.

    Key c is visible to query i iff c <= last_visible[i]; unwritten cache
    slots are masked before the f32 softmax. For the steady-state S=1 case
    with impl="flash", dispatches to the Pallas single-query kernel: the XLA
    einsum lowers to B*H one-row GEMMs whose launch overhead dominates the
    whole decode step (see ops/pallas/decode_attention.py). Returns (B, S, d).
    """
    from ..quantize import QTensor

    b, s, d = q.shape
    hd = d // n_head
    scale = float(hd) ** -0.5  # == ((d/h)^-0.25)^2 applied once to q

    # int8 cross-KV: K's per-channel scale folds into the query; V's scale
    # multiplies the (linear-in-V) attention output.
    # Two quantized-cache flavors: cross-KV carries one scale per (channel)
    # -- folds into q / the output for free -- while the int8 SELF cache
    # carries one scale per ROW, (B, C, 1), applied to the score rows and
    # softmax weights below.
    k_scale = v_scale = k_rows = v_rows = None
    if isinstance(k_cache, QTensor):
        if k_cache.scale.ndim >= 2:
            k_rows = k_cache.scale  # (B, C) per-row
        else:
            k_scale = k_cache.scale  # (d,) per-channel
        k_cache = k_cache.q
    if isinstance(v_cache, QTensor):
        if v_cache.scale.ndim >= 2:
            v_rows = v_cache.scale
        else:
            v_scale = v_cache.scale
        v_cache = v_cache.q
    c = k_cache.shape[1]
    # rep > 1: kv row w serves q rows [w*rep, (w+1)*rep) -- beam lanes of one
    # window sharing a single per-window cross-KV copy (see init_cache).
    rep = b // k_cache.shape[0]

    if s == 1 and impl == "flash" and rep == 1 and k_rows is None:
        from ..ops.pallas.decode_attention import decode_attention

        pos = jnp.max(last_visible)
        q1 = q[:, 0].astype(jnp.float32) * scale
        if k_scale is not None:
            q1 = q1 * k_scale
        out = decode_attention(q1.astype(q.dtype), k_cache, v_cache, pos, n_head)
        if v_scale is not None:
            out = (out.astype(jnp.float32) * v_scale).astype(q.dtype)
        return out[:, None, :]

    # int8 cache on the einsum path (prefill): fold K's per-channel scale
    # into q and V's into the output -- never materialize a dequantized
    # cache (the f32 dequant of the full cross cache cost ~8 GB of HBM
    # traffic per prefill at large-v2 b32). The int8->bf16 operand converts
    # are exact and fuse into the dots.
    q_dtype = q.dtype
    q = q.astype(jnp.float32) * scale
    if k_scale is not None:
        q = q * k_scale
    out_dtype = (
        v_cache.dtype if v_scale is None and v_rows is None else q_dtype
    )
    bk = b // rep
    qh = q.astype(q_dtype).reshape(bk, rep * s, n_head, hd)
    kh = k_cache.astype(q_dtype).reshape(bk, c, n_head, hd)
    vh = v_cache.astype(q_dtype).reshape(bk, c, n_head, hd)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    )
    if k_rows is not None:
        scores = scores * k_rows[:, None, None, :]
    jcol = jnp.arange(c)[None, :]
    vis = jnp.tile(jnp.reshape(last_visible, (-1, 1)), (rep, 1))  # (rep*S, 1)
    scores = jnp.where((jcol > vis)[None, None], NEG_INF, scores)
    w = jax.nn.softmax(scores, axis=-1)
    if v_rows is not None:
        # Mask-sanitized: a prefix-permuted int8 cache leaves tail rows (and
        # scales) uninitialized; 0-weight * NaN-scale would poison the dot.
        w = w * jnp.where(
            (jcol > vis)[None, None], 0.0, v_rows[:, None, None, :]
        )
    w = w.astype(q_dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w, vh, preferred_element_type=jnp.float32
    ).reshape(b, s, d)
    if v_scale is not None:
        out = out * v_scale
    return out.astype(out_dtype)


def _decoder_step_fused(
    params: Params,
    tokens: jax.Array,  # (B, 1)
    pos: jax.Array,  # scalar int32
    cache: DecoderCache,
    cfg: WhisperConfig,
    parents: Optional[jax.Array] = None,  # (B,) i32 window-local beam parents
    dests: Optional[jax.Array] = None,  # (B,) i32 COW write slots
) -> Tuple[jax.Array, DecoderCache]:
    """Steady-state (S=1) decode step over layer-STACKED KV caches.

    Same math as `decoder_step`'s general path, but the per-layer scan never
    slices the KV caches: the full (L, B, C, d) buffers stay in the loop
    carry (self) / closure (cross) and the Pallas kernel picks its layer
    block via a scalar-prefetch index_map (decode_attention_stacked). The
    general path's scan-over-sliced-caches makes XLA materialize a staging
    copy of every layer's cache every step -- measured as the dominant cost
    of the whole decode step at large-v2 (see docs/PERFORMANCE.md).
    """
    from ..ops.pallas.decode_attention import decode_attention_stacked

    dec = params["decoder"]
    dec_cfg = cfg.text_decoder_config
    n_head, eps = dec_cfg.n_text_head, cfg.ln_eps
    b = tokens.shape[0]
    d = dec_cfg.n_text_state
    scale = float(d // n_head) ** -0.5

    x = dec["tok_emb"][tokens] + jax.lax.dynamic_slice_in_dim(
        dec["pos_emb"], pos, 1, axis=0
    )

    ck_arr, ck_scale = (
        (cache.cross_k.q, cache.cross_k.scale)
        if isinstance(cache.cross_k, QTensor)
        else (cache.cross_k, None)
    )
    cv_arr, cv_scale = (
        (cache.cross_v.q, cache.cross_v.scale)
        if isinstance(cache.cross_v, QTensor)
        else (cache.cross_v, None)
    )
    n_layer, b_cross, sa, _ = ck_arr.shape
    # Beam lanes of one window share ONE cross-KV copy (init_cache keeps the
    # cross cache per-window): kv_rep maps lane i -> window i // kv_rep in
    # the kernel, removing the K-fold duplicate cross reads that dominated
    # the beam step's HBM traffic (~2 GB/step at large-v2 W=8 K=5).
    kv_rep = b // b_cross
    pos_self = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (b,))
    pos_cross = jnp.full((b,), sa - 1, jnp.int32)

    # Valid-prefix self-attention read: only cache rows [0, pos] hold data;
    # a static ladder of c_used block sizes, selected per step by lax.switch
    # on pos, lets early steps stream only a sublane-aligned prefix of the
    # cache; every branch b guarantees pos < ladder[b] (cross-attention is
    # unaffected: all sa rows are always valid). Same-session on-chip A/B at
    # large-v2 (docs/PERFORMANCE.md valid-prefix study): +0.9% on the int8
    # self-KV beam config but -1.4% on bf16 greedy (the 4-branch switch in
    # the loop body costs more than the skipped tail DMA saves there, and
    # triples the greedy program's compile time), so the ladder defaults on
    # only for quantized self-KV. WHISPER_TPU_PREFIX_RUNGS overrides the
    # branch count (0/1 disables).
    c_self = (cache.self_k.q if isinstance(cache.self_k, QTensor)
              else cache.self_k).shape[2]
    default_rungs = 4 if isinstance(cache.self_k, QTensor) else 1
    _pr = current_knobs().prefix_rungs
    n_rungs = int(_pr) if _pr is not None else default_rungs
    prefix_g = (
        math.ceil(math.ceil(c_self / n_rungs) / 32) * 32 if n_rungs > 1
        else c_self
    )  # 32-aligned rung granularity
    if c_self % 32 == 0 and prefix_g < c_self:
        prefix_ladder = sorted(
            {min((i + 1) * prefix_g, c_self)
             for i in range(-(-c_self // prefix_g))}
        )
        prefix_idx = jnp.minimum(
            jnp.asarray(pos, jnp.int32) // prefix_g, len(prefix_ladder) - 1)
    else:
        prefix_ladder, prefix_idx = [c_self], None

    # Per-layer xs: weight slices (consumed by XLA GEMMs, which stage their
    # operands through VMEM anyway) plus the layer counter and the tiny
    # per-layer cross-KV quantization scales.
    scales = {}
    if ck_scale is not None:
        scales["ck"] = ck_scale  # (L, d)
    if cv_scale is not None:
        scales["cv"] = cv_scale

    # read-dedup (fused-kernel contract): the first claimant of each
    # distinct parent slab streams it from HBM, the rest copy VMEM-locally.
    # Computed ONCE per step here (outside the layer scan; parents are
    # layer-invariant). Default OFF: the round-5 on-chip A/B measured it
    # neutral on random parents and ~2% SLOWER in the beam-collapse regime
    # it was built for (the VMEM-local copies serialize against COW's
    # conditional write-backs; HBM re-reads of one slab overlap fine --
    # docs/PERFORMANCE.md round-5 study). cfg.knobs.dedup_reads /
    # WHISPER_TPU_DEDUP_READS=1 re-enables it for A/B.
    stage = None
    if parents is not None:
        if current_knobs().dedup_reads:
            from ..ops.pallas.permute_attention import compute_stage

            stage = compute_stage(parents, max(kv_rep, 1))
        else:
            stage = jnp.arange(b, dtype=jnp.int32)

    def body(carry, xs):
        h, self_k, self_v = carry
        p, l, sc = xs
        hn = layer_norm(h, p["attn_ln_g"], p["attn_ln_b"], eps)
        q, k, v = _qkv_proj(hn, p["qkv_w"], p["qkv_b"])
        q1 = (q[:, 0].astype(jnp.float32) * scale).astype(q.dtype)
        if isinstance(self_k, QTensor) and parents is not None:
            # Fused beam path: reshuffle-by-parents + append + attention in
            # ONE cache pass (ops/pallas/permute_attention.py) -- replaces
            # the separate permute kernel, the two dynamic-update-slice
            # appends, and the attention read. parents are window-local
            # with kv_rep lanes per window (the fused kernel's contract).
            from ..ops.pallas.permute_attention import (
                decode_attention_permute_fused,
            )

            kq, ks = _q8_rows(k[:, 0], self_k.q.dtype)
            vq, vs = _q8_rows(v[:, 0], self_v.q.dtype)

            def _fused(cu, q1=q1, sk=self_k, sv=self_v, l=l,
                       kq=kq, ks=ks, vq=vq, vs=vs):
                return decode_attention_permute_fused(
                    q1, sk.q, sv.q, sk.scale, sv.scale, kq, vq, ks, vs,
                    parents, pos, l, n_head, beam_k=max(kv_rep, 1),
                    c_used=cu, dests=dests, stage=stage,
                )

            if prefix_idx is None:
                attn, nkq, nvq, nks, nvs = _fused(c_self)
            else:
                attn, nkq, nvq, nks, nvs = jax.lax.switch(
                    prefix_idx,
                    [functools.partial(_fused, cu) for cu in prefix_ladder],
                )
            self_k = QTensor(nkq, nks)
            self_v = QTensor(nvq, nvs)
        elif isinstance(self_k, QTensor):
            # int8 self-KV: quantize the new row per lane, carry q + scale.
            kq, ks = _q8_rows(k, self_k.q.dtype)
            vq, vs = _q8_rows(v, self_v.q.dtype)
            self_k = QTensor(
                jax.lax.dynamic_update_slice(
                    self_k.q, kq[:, None], (0, l, pos, 0)),
                jax.lax.dynamic_update_slice(
                    self_k.scale, ks[:, None], (0, l, pos)),
            )
            self_v = QTensor(
                jax.lax.dynamic_update_slice(
                    self_v.q, vq[:, None], (0, l, pos, 0)),
                jax.lax.dynamic_update_slice(
                    self_v.scale, vs[:, None], (0, l, pos)),
            )
            def _self_attn_q(cu, q1=q1, sk=self_k, sv=self_v, l=l):
                return decode_attention_stacked(
                    q1, sk.q, sv.q, pos_self, l, n_head,
                    batch_major=True,
                    k_rowscale=sk.scale, v_rowscale=sv.scale, c_used=cu,
                )

            if prefix_idx is None:
                attn = _self_attn_q(c_self)
            else:
                attn = jax.lax.switch(
                    prefix_idx,
                    [functools.partial(_self_attn_q, cu)
                     for cu in prefix_ladder],
                )
        else:
            self_k = jax.lax.dynamic_update_slice(
                self_k, k[:, None].astype(self_k.dtype), (0, l, pos, 0)
            )
            self_v = jax.lax.dynamic_update_slice(
                self_v, v[:, None].astype(self_v.dtype), (0, l, pos, 0)
            )
            def _self_attn(cu, q1=q1, sk=self_k, sv=self_v, l=l):
                return decode_attention_stacked(
                    q1, sk, sv, pos_self, l, n_head, batch_major=True,
                    c_used=cu,
                )

            if prefix_idx is None:
                attn = _self_attn(c_self)
            else:
                attn = jax.lax.switch(
                    prefix_idx,
                    [functools.partial(_self_attn, cu)
                     for cu in prefix_ladder],
                )
        h = h + _linear(attn[:, None, :], p["attn_o_w"], p["attn_o_b"])

        hn = layer_norm(h, p["cross_ln_g"], p["cross_ln_b"], eps)
        q = _linear(hn, p["cross_q_w"], p["cross_q_b"])
        q1 = q[:, 0].astype(jnp.float32) * scale
        if "ck" in sc:
            q1 = q1 * sc["ck"]
        cross = decode_attention_stacked(
            q1.astype(q.dtype), ck_arr, cv_arr, pos_cross, l, n_head,
            kv_rep=kv_rep,
        )
        if "cv" in sc:
            cross = (cross.astype(jnp.float32) * sc["cv"]).astype(h.dtype)
        h = h + _linear(cross[:, None, :], p["cross_o_w"], p["cross_o_b"])

        hn = layer_norm(h, p["mlp_ln_g"], p["mlp_ln_b"], eps)
        hn = _linear(
            jax.nn.gelu(_linear(hn, p["mlp1_w"], p["mlp1_b"]), approximate=False),
            p["mlp2_w"],
            p["mlp2_b"],
        )
        return (h + hn, self_k, self_v), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body,
        (x, cache.self_k, cache.self_v),
        (dec["blocks"], jnp.arange(n_layer), scales),
    )
    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps)
    logits = jax.lax.dot_general(
        x, dec["tok_emb"], (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return logits, DecoderCache(new_k, new_v, cache.cross_k, cache.cross_v)


@_with_knobs
def decoder_step(
    params: Params,
    tokens: jax.Array,  # (B, S) new tokens at absolute positions [pos, pos+S)
    pos: jax.Array,  # scalar int32
    cache: DecoderCache,
    cfg: WhisperConfig,
    parents: Optional[jax.Array] = None,  # (B,) i32 beam parents (see below)
    dests: Optional[jax.Array] = None,  # (B,) i32 COW write slots (see below)
) -> Tuple[jax.Array, DecoderCache]:
    """Run the decoder on S new tokens using/updating the KV cache.

    Returns (logits (B, S, V), updated cache). S=1 is the steady-state decode
    step; S=prompt_len is prefill. Numerically equivalent to the reference's
    full recompute (causal masking makes cached and full attention identical).

    `parents` (beam reshuffle, window-local indices) folds the self-KV cache
    permute into the decode step: supported only on the S=1 flash path with
    a quantized (QTensor) self cache, where the fused Pallas kernel performs
    reshuffle + append + attention in one cache pass. The returned cache is
    the permuted-and-appended one. `dests` (copy-on-write reshuffle,
    decode/beam.py::_cow_assign) additionally redirects lane i's write-back
    to physical slot dests[i], eliding the full-slab write when the lane
    stays in its parent's slot; the returned cache is then in PHYSICAL slot
    order and the caller must track the logical->physical map.
    """
    if dests is not None and parents is None:
        # Mirror the parents guard: dests only redirect a fused reshuffle's
        # write-backs -- without parents there is no reshuffle, and silently
        # ignoring them would hide a caller bug (no COW semantics applied).
        raise ValueError(
            "dests= requires parents= (the fused COW reshuffle path)"
        )
    if tokens.shape[1] == 1 and cfg.attention == "flash":
        if parents is not None and not isinstance(cache.self_k, QTensor):
            raise ValueError(
                "fused beam reshuffle (parents=...) requires a quantized "
                "self-KV cache (self_quant)"
            )
        return _decoder_step_fused(
            params, tokens, pos, cache, cfg, parents, dests)
    if parents is not None:
        raise ValueError(
            "parents= is only supported on the S=1 flash decode path; "
            "permute the cache explicitly before this call"
        )
    dec = params["decoder"]
    dec_cfg = cfg.text_decoder_config
    n_head, eps = dec_cfg.n_text_head, cfg.ln_eps
    b, s = tokens.shape

    x = dec["tok_emb"][tokens] + jax.lax.dynamic_slice_in_dim(
        dec["pos_emb"], pos, s, axis=0
    )

    impl = cfg.attention
    ck_arr = cache.cross_k.q if hasattr(cache.cross_k, "q") else cache.cross_k
    sa = ck_arr.shape[2]
    causal_vis = pos + jnp.arange(s)  # (S,) last visible self key per query
    cross_vis = jnp.full((s,), sa - 1)  # cross: all encoder keys visible

    def body(h, layer):
        p, k_cache, v_cache, ck, cv = layer
        hn = layer_norm(h, p["attn_ln_g"], p["attn_ln_b"], eps)
        q, k, v = _qkv_proj(hn, p["qkv_w"], p["qkv_b"])
        if isinstance(k_cache, QTensor):
            kq, ks = _q8_rows(k, k_cache.q.dtype)
            vq, vs = _q8_rows(v, v_cache.q.dtype)
            k_cache = QTensor(
                jax.lax.dynamic_update_slice_in_dim(
                    k_cache.q, kq, pos, axis=1),
                jax.lax.dynamic_update_slice_in_dim(
                    k_cache.scale, ks, pos, axis=1))
            v_cache = QTensor(
                jax.lax.dynamic_update_slice_in_dim(
                    v_cache.q, vq, pos, axis=1),
                jax.lax.dynamic_update_slice_in_dim(
                    v_cache.scale, vs, pos, axis=1))
        else:
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k, pos, axis=1)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v, pos, axis=1)
        attn = _cached_attention(
            q, k_cache, v_cache, causal_vis, n_head, impl
        )
        h = h + _linear(attn, p["attn_o_w"], p["attn_o_b"])

        hn = layer_norm(h, p["cross_ln_g"], p["cross_ln_b"], eps)
        q = _linear(hn, p["cross_q_w"], p["cross_q_b"])
        cross = _cached_attention(q, ck, cv, cross_vis, n_head, impl)
        h = h + _linear(cross, p["cross_o_w"], p["cross_o_b"])

        hn = layer_norm(h, p["mlp_ln_g"], p["mlp_ln_b"], eps)
        hn = _linear(
            jax.nn.gelu(_linear(hn, p["mlp1_w"], p["mlp1_b"]), approximate=False),
            p["mlp2_w"],
            p["mlp2_b"],
        )
        return h + hn, (k_cache, v_cache)

    # The scan needs layer-major xs; the self caches are stored batch-major
    # (see init_cache), so transpose around the scan. This path runs once
    # per window (prefill) or under the non-flash test configs -- the
    # steady-state fused path never relayouts.
    swap = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.swapaxes(a, 0, 1), t)
    x, (new_k, new_v) = jax.lax.scan(
        body, x, (dec["blocks"], swap(cache.self_k), swap(cache.self_v),
                  cache.cross_k, cache.cross_v)
    )
    x = layer_norm(x, dec["ln_g"], dec["ln_b"], eps)
    logits = jax.lax.dot_general(
        x, dec["tok_emb"], (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return logits, DecoderCache(swap(new_k), swap(new_v),
                                cache.cross_k, cache.cross_v)


def permute_lanes(cache_arr: jax.Array, parents: jax.Array) -> jax.Array:
    """Permute a BATCH-major (B, L, C, d) self cache along its lane axis:
    out[i] = in[parents[i]].

    The lane axis is outermost, so this gather moves whole contiguous
    (L*C*d) slabs and runs at copy speed. The layout is the point: with the
    older layer-major (L, B, C, d) cache, the same logical permute was an
    inner-axis gather that XLA ran ~4.5x off the memory roofline (9 ms of
    the 19 ms beam step at large-v2 W=8 K=5), and a one-hot MXU matmul
    formulation still cost 7.7 ms -- an elementwise-producible fresh buffer
    measured ~free, pinning the blame on the non-contiguous data movement
    (docs/PERFORMANCE.md).
    """
    return jnp.take(cache_arr, parents, axis=0)


def reorder_cache(cache: DecoderCache, parents: jax.Array) -> DecoderCache:
    """Permute the self-attn cache along the batch axis (beam reshuffle)."""
    perm = lambda t: jax.tree_util.tree_map(
        lambda a: permute_lanes(a, parents), t)
    return DecoderCache(
        perm(cache.self_k),
        perm(cache.self_v),
        cache.cross_k,
        cache.cross_v,
    )
