"""Reader for Burn `.mpk.gz` records (the reference's fast-load format).

The reference's convert CLI saves the model with Burn 0.9's `DefaultRecorder`
(= gzipped named-MessagePack, src/bin/convert/main.rs:17-19): the module
record tree is serialized with field names preserved, tensors as
`DataSerialize { value: [f32...], shape: [usize...] }` leaves, and constants
(usize fields like `n_head`) as unit/nil values.

This reader was written against that format's structure as documented by the
Burn 0.9 sources referenced in SURVEY.md; since no sample `.mpk.gz` exists in
this offline environment it is deliberately *tolerant*: it walks the decoded
msgpack tree, treats any map containing ("value", "shape") -- possibly nested
under "param"/"id" wrappers -- as a tensor leaf, and resolves module paths by
field name (encoder/decoder/conv1/blocks/... -- the same names as the Rust
structs in src/model/mod.rs). Round-trip tests exercise it against
synthetically constructed records in both plain and param-wrapped layouts.
"""

from __future__ import annotations

import gzip
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..config import AudioEncoderConfig, TextDecoderConfig, WhisperConfig

Params = Dict[str, Any]


def _decode_msgpack(raw: bytes) -> Any:
    import msgpack

    return msgpack.unpackb(raw, raw=False, strict_map_key=False)


def _as_tensor(node: Any) -> Optional[np.ndarray]:
    """Recognize a tensor leaf in any of the plausible Burn serializations."""
    if not isinstance(node, dict):
        return None
    # unwrap Param { id, value/param } wrappers
    for wrapper in ("param", "value"):
        if wrapper in node and isinstance(node[wrapper], dict):
            inner = _as_tensor(node[wrapper])
            if inner is not None:
                return inner
    if "value" in node and "shape" in node:
        value, shape = node["value"], node["shape"]
        if isinstance(value, (list, bytes)) and isinstance(shape, list):
            if isinstance(value, bytes):
                arr = np.frombuffer(value, dtype="<f4")
            else:
                arr = np.asarray(value, dtype=np.float32)
            return arr.reshape([int(s) for s in shape])
    return None


def _get(node: Dict[str, Any], *names: str) -> Any:
    for n in names:
        if isinstance(node, dict) and n in node:
            return node[n]
    raise KeyError(f"record missing field {names} (have {list(node)[:10]})")


def _tensor(node: Dict[str, Any], *names: str) -> np.ndarray:
    t = _as_tensor(_get(node, *names))
    if t is None:
        raise ValueError(f"field {names} is not a tensor leaf")
    return t


def _maybe_tensor(node: Dict[str, Any], name: str) -> Optional[np.ndarray]:
    if not isinstance(node, dict) or name not in node or node[name] is None:
        return None
    return _as_tensor(node[name])


def _linear(node: Dict[str, Any]) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Burn LinearRecord {weight (d_in, d_out), bias}."""
    return _tensor(node, "weight"), _maybe_tensor(node, "bias")


def _ln(node: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
    return _tensor(node, "gamma", "weight"), _tensor(node, "beta", "bias")


def _attn(node: Dict[str, Any], d: int, cross: bool) -> Dict[str, np.ndarray]:
    qw, qb = _linear(_get(node, "query"))
    kw, kb = _linear(_get(node, "key"))
    vw, vb = _linear(_get(node, "value"))
    ow, ob = _linear(_get(node, "out"))
    if kb is None:
        kb = np.zeros((d,), np.float32)
    if cross:
        return {
            "cross_q_w": qw, "cross_q_b": qb,
            "cross_kv_w": np.stack([kw, vw], axis=1),
            "cross_kv_b": np.stack([kb, vb]),
            "cross_o_w": ow, "cross_o_b": ob,
        }
    return {
        "qkv_w": np.stack([qw, kw, vw], axis=1),
        "qkv_b": np.stack([qb, kb, vb]),
        "attn_o_w": ow, "attn_o_b": ob,
    }


def _block(node: Dict[str, Any], d: int, cross: bool) -> Dict[str, np.ndarray]:
    blk: Dict[str, np.ndarray] = {}
    blk.update(_attn(_get(node, "attn"), d, cross=False))
    g, b = _ln(_get(node, "attn_ln"))
    blk["attn_ln_g"], blk["attn_ln_b"] = g, b
    if cross:
        blk.update(_attn(_get(node, "cross_attn"), d, cross=True))
        g, b = _ln(_get(node, "cross_attn_ln"))
        blk["cross_ln_g"], blk["cross_ln_b"] = g, b
    mlp = _get(node, "mlp")
    m1w, m1b = _linear(_get(mlp, "lin1", "mlp1"))
    m2w, m2b = _linear(_get(mlp, "lin2", "mlp2"))
    blk["mlp1_w"], blk["mlp1_b"] = m1w, m1b
    blk["mlp2_w"], blk["mlp2_b"] = m2w, m2b
    g, b = _ln(_get(node, "mlp_ln"))
    blk["mlp_ln_g"], blk["mlp_ln_b"] = g, b
    return blk


def _stack(blocks: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([b[k] for b in blocks]) for k in blocks[0]}


def load_whisper_record(
    path: str, cfg: Optional[WhisperConfig] = None
) -> Tuple[Params, WhisperConfig]:
    """Load a Burn `.mpk.gz` (or plain `.mpk`) Whisper record."""
    with open(path, "rb") as f:
        raw = f.read()
    if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    root = _decode_msgpack(raw)
    if not isinstance(root, dict):
        raise ValueError(f"{path}: unexpected msgpack root {type(root)}")
    # some serializations wrap the record in {"item": ...}
    if "item" in root and "encoder" not in root:
        root = root["item"]

    enc = _get(root, "encoder")
    dec = _get(root, "decoder")

    # conv weights: Burn Conv1d stores (channels_out, channels_in, kernel)
    conv1_w = _tensor(_get(enc, "conv1"), "weight")
    conv1_b = _tensor(_get(enc, "conv1"), "bias")
    conv2_w = _tensor(_get(enc, "conv2"), "weight")
    conv2_b = _tensor(_get(enc, "conv2"), "bias")
    n_mels = conv1_w.shape[1]
    d = conv1_w.shape[0]
    conv1_w = conv1_w.transpose(2, 1, 0)  # -> (k, in, out)
    conv2_w = conv2_w.transpose(2, 1, 0)

    enc_blocks_raw = _get(enc, "blocks")
    enc_blocks = [_block(bn, d, cross=False) for bn in enc_blocks_raw]
    enc_pos = _tensor(enc, "positional_embedding")
    lnp_g, lnp_b = _ln(_get(enc, "ln_post"))

    tok_emb = _tensor(dec, "token_embedding")
    dec_pos = _tensor(dec, "positional_embedding")
    dec_blocks_raw = _get(dec, "blocks")
    dec_blocks = [_block(bn, d, cross=True) for bn in dec_blocks_raw]
    ln_g, ln_b = _ln(_get(dec, "ln"))

    params: Params = {
        "encoder": {
            "conv1_w": conv1_w, "conv1_b": conv1_b,
            "conv2_w": conv2_w, "conv2_b": conv2_b,
            "pos_emb": enc_pos,
            "blocks": _stack(enc_blocks),
            "ln_post_g": lnp_g, "ln_post_b": lnp_b,
        },
        "decoder": {
            "tok_emb": tok_emb, "pos_emb": dec_pos,
            "blocks": _stack(dec_blocks),
            "ln_g": ln_g, "ln_b": ln_b,
        },
    }

    if cfg is None:
        # n_head is a Burn constant (not serialized); fall back to the
        # standard head width d/64 used by every Whisper size.
        n_head = max(1, d // 64)
        cfg = WhisperConfig(
            audio_encoder_config=AudioEncoderConfig(
                n_mels=n_mels,
                n_audio_ctx=enc_pos.shape[0],
                n_audio_state=d,
                n_audio_head=n_head,
                n_audio_layer=len(enc_blocks),
            ),
            text_decoder_config=TextDecoderConfig(
                n_vocab=tok_emb.shape[0],
                n_text_ctx=dec_pos.shape[0],
                n_text_state=dec_pos.shape[1],
                n_text_head=n_head,
                n_text_layer=len(dec_blocks),
            ),
        )
    return params, cfg
