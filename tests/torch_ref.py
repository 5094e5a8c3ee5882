"""Independent PyTorch (CPU) implementation of the Whisper forward pass.

Used only as a numeric oracle in tests: it re-implements the published Whisper
architecture (conv stem, pre-LN residual blocks, (d/h)^-0.25 dual-scaled
attention, bias-free K, tied output embedding) in a deliberately different
style (per-layer module loops, torch primitives) so that agreement with the
JAX implementation is meaningful evidence of correctness, standing in for the
reference's Burn/tch forward which we cannot run here.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def _attention(q, k, v, n_head, mask=None):
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // n_head
    scale = (d / n_head) ** -0.25
    q = (q * scale).view(b, sq, n_head, hd).permute(0, 2, 1, 3)
    k = (k * scale).view(b, sk, n_head, hd).permute(0, 2, 3, 1)
    v = v.view(b, sk, n_head, hd).permute(0, 2, 1, 3)
    qk = q @ k
    if mask is not None:
        qk = qk + mask[:sq, :sk]
    w = torch.softmax(qk, dim=-1)
    return (w @ v).permute(0, 2, 1, 3).reshape(b, sq, d)


class TorchWhisper:
    """Runs forward passes from the whisper_tpu parameter pytree."""

    def __init__(self, params, cfg):
        self.cfg = cfg
        self.p = params

    # -- encoder ----------------------------------------------------------
    def encode(self, mel: np.ndarray) -> torch.Tensor:
        cfg = self.cfg
        e = self.p["encoder"]
        x = _t(mel)  # (B, n_mels, T)
        # conv weights stored (K, C_in, C_out) -> torch wants (C_out, C_in, K)
        w1 = _t(e["conv1_w"]).permute(2, 1, 0)
        w2 = _t(e["conv2_w"]).permute(2, 1, 0)
        x = F.gelu(F.conv1d(x, w1, _t(e["conv1_b"]), padding=1))
        x = F.gelu(F.conv1d(x, w2, _t(e["conv2_b"]), stride=2, padding=1))
        x = x.permute(0, 2, 1)  # (B, T', d)
        x = x + _t(e["pos_emb"])[: x.shape[1]]

        n_head = cfg.audio_encoder_config.n_audio_head
        eps = cfg.ln_eps
        L = cfg.audio_encoder_config.n_audio_layer
        blk = e["blocks"]
        for i in range(L):
            x = self._block(x, blk, i, n_head, eps, xa=None, mask=None)
        return F.layer_norm(
            x, (x.shape[-1],), _t(e["ln_post_g"]), _t(e["ln_post_b"]), eps
        )

    # -- decoder ----------------------------------------------------------
    def decode(self, tokens: np.ndarray, enc_out: torch.Tensor) -> torch.Tensor:
        cfg = self.cfg
        d = self.p["decoder"]
        tok = torch.from_numpy(np.asarray(tokens, dtype=np.int64))
        emb = _t(d["tok_emb"])
        x = emb[tok] + _t(d["pos_emb"])[: tok.shape[1]]

        s = tok.shape[1]
        mask = torch.full((s, s), float("-inf")).triu(1)

        n_head = cfg.text_decoder_config.n_text_head
        eps = cfg.ln_eps
        L = cfg.text_decoder_config.n_text_layer
        blk = d["blocks"]
        for i in range(L):
            x = self._block(x, blk, i, n_head, eps, xa=enc_out, mask=mask)
        x = F.layer_norm(x, (x.shape[-1],), _t(d["ln_g"]), _t(d["ln_b"]), eps)
        return x @ emb.T

    def forward(self, mel: np.ndarray, tokens: np.ndarray) -> np.ndarray:
        return self.decode(tokens, self.encode(mel)).numpy()

    # -- shared block -----------------------------------------------------
    def _block(self, x, blk, i, n_head, eps, xa, mask):
        def ln(h, gk, bk):
            return F.layer_norm(h, (h.shape[-1],), _t(blk[gk][i]), _t(blk[bk][i]), eps)

        def lin(h, wk, bk=None):
            w = _t(blk[wk][i])
            y = h @ w
            if bk is not None:
                y = y + _t(blk[bk][i])
            return y

        h = ln(x, "attn_ln_g", "attn_ln_b")
        # (d, 3, d) fused weights -> flatten to (d, 3d) for a plain matmul
        w = _t(blk["qkv_w"][i]).reshape(h.shape[-1], -1)
        qkv = h @ w + _t(blk["qkv_b"][i]).reshape(-1)
        q, k, v = qkv.chunk(3, dim=-1)
        x = x + lin(_attention(q, k, v, n_head, mask), "attn_o_w", "attn_o_b")

        if xa is not None:
            h = ln(x, "cross_ln_g", "cross_ln_b")
            q = lin(h, "cross_q_w", "cross_q_b")
            wkv = _t(blk["cross_kv_w"][i]).reshape(xa.shape[-1], -1)
            kv = xa @ wkv + _t(blk["cross_kv_b"][i]).reshape(-1)
            ck, cv = kv.chunk(2, dim=-1)
            x = x + lin(_attention(q, ck, cv, n_head), "cross_o_w", "cross_o_b")

        h = ln(x, "mlp_ln_g", "mlp_ln_b")
        h = lin(F.gelu(lin(h, "mlp1_w", "mlp1_b")), "mlp2_w", "mlp2_b")
        return x + h
