"""Sharding rules: Megatron-style tensor parallelism + data parallelism.

The recipe (per the public scaling playbook): pick a mesh, annotate parameter
and activation shardings with PartitionSpecs, jit -- XLA/GSPMD inserts the
collectives (all-reduce over "tp" after row-parallel projections; everything
rides ICI).

Per transformer block (d = n_state, h = heads):
  column-parallel (output axis sharded over "tp", no comm):
    qkv_w (L, d, 3, d)   -> P(None, None, None, "tp")   # head axis
    cross_q_w (L, d, d)  -> P(None, None, "tp")
    cross_kv_w (L,d,2,d) -> P(None, None, None, "tp")
    mlp1_w (L, d, 4d)    -> P(None, None, "tp")
  row-parallel (input axis sharded; XLA adds a psum over "tp"):
    attn_o_w (L, d, d)   -> P(None, "tp", None)
    cross_o_w (L, d, d)  -> P(None, "tp", None)
    mlp2_w (L, 4d, d)    -> P(None, "tp", None)
  replicated: layer norms, biases of row-parallel layers, embeddings, convs.

The fused qkv keeps its projection axis (3) separate from the head axis (d)
precisely so this sharding never splits across the q|k|v boundary
(models/whisper.py `_qkv_proj`).

The attention head count must be divisible by the "tp" size for balanced
shards (true for all Whisper sizes with tp in {1,2,4}; large-v2's 20 heads
also allow tp=5,10,20).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import WhisperConfig

Params = Dict[str, Any]


def _block_pspecs(cross: bool) -> Dict[str, P]:
    p = {
        "attn_ln_g": P(), "attn_ln_b": P(),
        "qkv_w": P(None, None, None, "tp"),
        "qkv_b": P(None, None, "tp"),
        "attn_o_w": P(None, "tp", None),
        "attn_o_b": P(),
        "mlp_ln_g": P(), "mlp_ln_b": P(),
        "mlp1_w": P(None, None, "tp"),
        "mlp1_b": P(None, "tp"),
        "mlp2_w": P(None, "tp", None),
        "mlp2_b": P(),
    }
    if cross:
        p.update({
            "cross_ln_g": P(), "cross_ln_b": P(),
            "cross_q_w": P(None, None, "tp"),
            "cross_q_b": P(None, "tp"),
            "cross_kv_w": P(None, None, None, "tp"),
            "cross_kv_b": P(None, None, "tp"),
            "cross_o_w": P(None, "tp", None),
            "cross_o_b": P(),
        })
    return p


def param_pspecs(cfg: WhisperConfig) -> Params:
    """PartitionSpec pytree matching the parameter pytree structure."""
    return {
        "encoder": {
            "conv1_w": P(), "conv1_b": P(),
            "conv2_w": P(), "conv2_b": P(),
            "pos_emb": P(),
            "blocks": _block_pspecs(cross=False),
            "ln_post_g": P(), "ln_post_b": P(),
        },
        "decoder": {
            "tok_emb": P(),
            "pos_emb": P(),
            "blocks": _block_pspecs(cross=True),
            "ln_g": P(), "ln_b": P(),
        },
    }


def batch_pspec() -> P:
    """Activations / batched inputs: shard the leading batch axis over dp."""
    return P("dp")


def shard_params(params: Params, mesh: Mesh, cfg: WhisperConfig) -> Params:
    """Place a parameter pytree onto the mesh with the TP/DP sharding rules."""
    specs = param_pspecs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def validate_tp(cfg: WhisperConfig, tp: int) -> None:
    """Check head/hidden divisibility for a balanced tp sharding."""
    for name, heads in (
        ("encoder", cfg.audio_encoder_config.n_audio_head),
        ("decoder", cfg.text_decoder_config.n_text_head),
    ):
        if heads % tp != 0:
            raise ValueError(
                f"{name} head count {heads} not divisible by tp={tp}"
            )
    if (4 * cfg.n_state) % tp != 0:
        raise ValueError(f"MLP hidden {4*cfg.n_state} not divisible by tp={tp}")
