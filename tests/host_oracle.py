"""Pure-NumPy float64 implementation of the reference's COMPLETE pipeline.

An independent, host-only executable specification of whisper-burn's
end-to-end semantics (src/transcribe.rs:23-383), used by
tests/test_golden_oracle.py as the strongest offline stand-in for the
env-blocked golden E2E gate: it composes EVERY stage -- log-mel frontend
(src/audio.rs:34-56), encoder/decoder forward (src/model/mod.rs),
full-recompute host beam search (src/beam.rs driven as in
src/transcribe.rs:253-307), windowing with the ~14.9s/3s-overlap rule
(src/transcribe.rs:114-138), the 10-frame zero pad (src/transcribe.rs:170-177)
and token-overlap stitching (src/transcribe.rs:76-110) -- so composition bugs
cannot hide between the piecewise parity tests.

Deliberately different implementation style from whisper_tpu: per-layer
Python loops, np.fft.rfft instead of the GEMM-DFT, f64 throughout, a
dict-of-arrays walked by explicit indexing. Shares ONLY the parameter pytree
(the object under test is the compute, not the storage layout) and the
host-side tokenizer.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np
from scipy.special import erf

from whisper_tpu.decode import host_beam

N_FFT = 400
HOP = 160
SAMPLE_RATE = 16000


# ---------------------------------------------------------------------------
# Audio frontend (src/audio.rs:34-56), f64 with np.fft.rfft.
# ---------------------------------------------------------------------------


def oracle_max_waveform_samples(n_frame_max: int) -> int:
    """src/audio.rs:12-17: HOP*(n+1) + is_odd(N_FFT) - 1."""
    return HOP * (n_frame_max + 1) + (N_FFT % 2) - 1


def oracle_mel_filters(n_mels: int, sr: float = SAMPLE_RATE) -> np.ndarray:
    """Slaney-normalized triangular filterbank (src/audio.rs:67-143), f64."""

    def hz_to_mel(f):
        f_sp = 200.0 / 3.0
        if f >= 1000.0:
            return 1000.0 / f_sp + math.log(f / 1000.0) / (math.log(6.4) / 27.0)
        return f / f_sp

    def mel_to_hz(m):
        f_sp = 200.0 / 3.0
        min_log_mel = 1000.0 / f_sp
        out = np.empty_like(m)
        for i, mv in enumerate(m):
            if mv >= min_log_mel:
                out[i] = 1000.0 * math.exp((math.log(6.4) / 27.0) * (mv - min_log_mel))
            else:
                out[i] = f_sp * mv
        return out

    n_freq = N_FFT // 2 + 1
    fftfreqs = np.arange(n_freq, dtype=np.float64) * (sr / N_FFT)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    w = np.zeros((n_mels, n_freq))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fftfreqs - lo) / (ctr - lo)
        down = (hi - fftfreqs) / (hi - ctr)
        w[m] = np.maximum(0.0, np.minimum(up, down)) * (2.0 / (hi - lo))
    return w


def oracle_prep_audio(wave: np.ndarray, n_mels: int) -> np.ndarray:
    """Waveform (T,) -> log-mel (n_mels, F): reflection pad, periodic Hann,
    rfft power, drop-last-frame, mel matmul, log10@1e-10, (max-8) clamp,
    (x+4)/4 (src/audio.rs:34-56)."""
    x = np.asarray(wave, np.float64)
    pad = N_FFT // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = (len(xp) - N_FFT) // HOP + 1
    n = np.arange(N_FFT, dtype=np.float64)
    window = np.sin(n * math.pi / N_FFT) ** 2
    frames = np.stack(
        [xp[i * HOP: i * HOP + N_FFT] * window for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames, axis=-1)  # (F, n_freq)
    power = (spec.real ** 2 + spec.imag ** 2).T  # (n_freq, F)
    power = power[:, :-1]  # drop last frame (src/audio.rs:42)

    mel = oracle_mel_filters(n_mels) @ power
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# Model forward (src/model/mod.rs), f64 per-layer loops.
# ---------------------------------------------------------------------------


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def _ln(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * g + b


def _softmax(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _attn(q, k, v, n_head, mask=None):
    """(S, d) projections; (d/h)^-0.25 on BOTH q and k
    (src/model/mod.rs:493-533)."""
    sq, d = q.shape
    sk = k.shape[0]
    hd = d // n_head
    scale = (d / n_head) ** -0.25
    qh = (q * scale).reshape(sq, n_head, hd).transpose(1, 0, 2)
    kh = (k * scale).reshape(sk, n_head, hd).transpose(1, 2, 0)
    vh = v.reshape(sk, n_head, hd).transpose(1, 0, 2)
    scores = qh @ kh  # (h, sq, sk)
    if mask is not None:
        scores = scores + mask
    return (_softmax(scores) @ vh).transpose(1, 0, 2).reshape(sq, d)


def _conv1d(x: np.ndarray, w: np.ndarray, b: np.ndarray, stride: int) -> np.ndarray:
    """x (T, C_in), w (K=3, C_in, C_out), padding=1 -> (ceil(T/stride), C_out)."""
    k, cin, cout = w.shape
    xp = np.pad(x, ((1, 1), (0, 0)))
    t_out = (x.shape[0] + 2 - k) // stride + 1
    out = np.zeros((t_out, cout))
    for j in range(k):
        out += xp[j: j + (t_out - 1) * stride + 1: stride] @ w[j]
    return out + b


class OracleWhisper:
    """f64 NumPy forward over the whisper_tpu parameter pytree."""

    def __init__(self, params, cfg):
        self.p = {
            side: {
                k: (
                    {kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
                    if k == "blocks"
                    else np.asarray(v, np.float64)
                )
                for k, v in params[side].items()
            }
            for side in ("encoder", "decoder")
        }
        self.cfg = cfg

    def encode(self, mel: np.ndarray) -> np.ndarray:
        """mel (n_mels, T) -> (ceil(T/2), d) (src/model/mod.rs:228-260)."""
        cfg = self.cfg.audio_encoder_config
        e = self.p["encoder"]
        assert mel.shape[0] == cfg.n_mels
        assert mel.shape[1] <= cfg.n_audio_ctx  # the reference's quirky guard
        x = _gelu(_conv1d(mel.T, e["conv1_w"], e["conv1_b"], 1))
        x = _gelu(_conv1d(x, e["conv2_w"], e["conv2_b"], 2))
        x = x + e["pos_emb"][: x.shape[0]]
        blk = e["blocks"]
        for i in range(cfg.n_audio_layer):
            x = self._block(x, blk, i, cfg.n_audio_head, xa=None)
        return _ln(x, e["ln_post_g"], e["ln_post_b"], self.cfg.ln_eps)

    def decode(self, tokens: Sequence[int], enc: np.ndarray) -> np.ndarray:
        """tokens (S,) + enc (Sa, d) -> logits (S, V) (src/model/mod.rs:131-157)."""
        cfg = self.cfg.text_decoder_config
        d = self.p["decoder"]
        toks = np.asarray(tokens, np.int64)
        s = len(toks)
        x = d["tok_emb"][toks] + d["pos_emb"][:s]
        mask = np.triu(np.full((s, s), -np.inf), 1)
        blk = d["blocks"]
        for i in range(cfg.n_text_layer):
            x = self._block(x, blk, i, cfg.n_text_head, xa=enc, mask=mask)
        x = _ln(x, d["ln_g"], d["ln_b"], self.cfg.ln_eps)
        return x @ d["tok_emb"].T

    def decode_cross_weights(
        self, tokens: Sequence[int], enc: np.ndarray
    ) -> np.ndarray:
        """Teacher-forced pass returning every layer's cross-attention
        softmax, (L, H, S, Sa) f64 — the oracle for
        align.cross_attention_weights."""
        cfg = self.cfg.text_decoder_config
        d_ = self.p["decoder"]
        n_head = cfg.n_text_head
        eps = self.cfg.ln_eps
        toks = np.asarray(tokens, np.int64)
        s = len(toks)
        x = d_["tok_emb"][toks] + d_["pos_emb"][:s]
        mask = np.triu(np.full((s, s), -np.inf), 1)
        blk = d_["blocks"]
        d = x.shape[-1]
        hd = d // n_head
        scale = (d / n_head) ** -0.25
        ws = []
        for i in range(cfg.n_text_layer):
            h = _ln(x, blk["attn_ln_g"][i], blk["attn_ln_b"][i], eps)
            qkv = h @ blk["qkv_w"][i].reshape(d, 3 * d) + blk["qkv_b"][i].reshape(-1)
            q, k, v = np.split(qkv, 3, axis=-1)
            x = x + _attn(q, k, v, n_head, mask) @ blk["attn_o_w"][i] + blk["attn_o_b"][i]

            h = _ln(x, blk["cross_ln_g"][i], blk["cross_ln_b"][i], eps)
            q = h @ blk["cross_q_w"][i] + blk["cross_q_b"][i]
            kv = enc @ blk["cross_kv_w"][i].reshape(d, 2 * d) + blk["cross_kv_b"][i].reshape(-1)
            ck, cv = np.split(kv, 2, axis=-1)
            qh = (q * scale).reshape(s, n_head, hd).transpose(1, 0, 2)
            kh = (ck * scale).reshape(-1, n_head, hd).transpose(1, 2, 0)
            vh = cv.reshape(-1, n_head, hd).transpose(1, 0, 2)
            w = _softmax(qh @ kh)  # (H, S, Sa)
            ws.append(w)
            out = (w @ vh).transpose(1, 0, 2).reshape(s, d)
            x = x + out @ blk["cross_o_w"][i] + blk["cross_o_b"][i]

            h = _ln(x, blk["mlp_ln_g"][i], blk["mlp_ln_b"][i], eps)
            x = x + _gelu(h @ blk["mlp1_w"][i] + blk["mlp1_b"][i]) @ blk["mlp2_w"][i] + blk["mlp2_b"][i]
        return np.stack(ws)

    def _block(self, x, blk, i, n_head, xa, mask=None):
        eps = self.cfg.ln_eps
        h = _ln(x, blk["attn_ln_g"][i], blk["attn_ln_b"][i], eps)
        d = h.shape[-1]
        qkv = h @ blk["qkv_w"][i].reshape(d, 3 * d) + blk["qkv_b"][i].reshape(-1)
        q, k, v = np.split(qkv, 3, axis=-1)
        x = x + _attn(q, k, v, n_head, mask) @ blk["attn_o_w"][i] + blk["attn_o_b"][i]

        if xa is not None:
            h = _ln(x, blk["cross_ln_g"][i], blk["cross_ln_b"][i], eps)
            q = h @ blk["cross_q_w"][i] + blk["cross_q_b"][i]
            kv = xa @ blk["cross_kv_w"][i].reshape(d, 2 * d) + blk["cross_kv_b"][i].reshape(-1)
            ck, cv = np.split(kv, 2, axis=-1)
            x = x + _attn(q, ck, cv, n_head) @ blk["cross_o_w"][i] + blk["cross_o_b"][i]

        h = _ln(x, blk["mlp_ln_g"][i], blk["mlp_ln_b"][i], eps)
        h = _gelu(h @ blk["mlp1_w"][i] + blk["mlp1_b"][i]) @ blk["mlp2_w"][i] + blk["mlp2_b"][i]
        return x + h


# ---------------------------------------------------------------------------
# Per-window decode: full-recompute beam / greedy with the suppression rule
# (src/transcribe.rs:148-383).
# ---------------------------------------------------------------------------


def _log_softmax(x: np.ndarray) -> np.ndarray:
    s = x - x.max(-1, keepdims=True)
    return s - np.log(np.exp(s).sum(-1, keepdims=True))


def oracle_timestamp_rules(
    logits: np.ndarray,  # (V,) f64, already suppress-masked
    seq: Sequence[int],  # tokens so far, prompt INCLUDED
    prompt_len: int,
    ts_begin: int,  # id of <|0.00|>; every id >= ts_begin is a timestamp
    eot_id: int,
    max_initial_idx: int,
) -> np.ndarray:
    """Sequential per-sequence reimplementation of OpenAI Whisper's
    ApplyTimestampRules — the independent oracle for
    decode/beam.apply_timestamp_rules (which is batched/in-graph).

    Written list-first on one sequence: inspect the sampled suffix, build
    the rule decisions as plain Python booleans, mask with f64 -inf.
    """
    out = np.asarray(logits, np.float64).copy()
    V = out.shape[0]
    sampled = [int(t) for t in seq[prompt_len:]]
    last_is_ts = len(sampled) >= 1 and sampled[-1] >= ts_begin
    pen_is_ts = len(sampled) >= 2 and sampled[-2] >= ts_begin

    # 1. pair rules
    if last_is_ts and pen_is_ts:  # a pair just closed: no third stamp
        out[ts_begin:] = -np.inf
    elif last_is_ts:  # single stamp open: only a timestamp or EOT follows
        for t in range(ts_begin):
            if t != eot_id:
                out[t] = -np.inf

    # 2. monotonicity: floor = max emitted stamp, +1 once its pair closed
    emitted = [t for t in sampled if t >= ts_begin]
    if emitted:
        floor = max(emitted) + (0 if (last_is_ts and not pen_is_ts) else 1)
        if floor > ts_begin:
            out[ts_begin:min(floor, V)] = -np.inf

    # 3. the first sampled token is a timestamp, capped
    if len(sampled) == 0:
        out[:ts_begin] = -np.inf
        cap = ts_begin + max_initial_idx
        if cap + 1 < V:
            out[cap + 1:] = -np.inf

    # 4. sum-of-logprobs: if p(any timestamp) beats the best text token,
    #    force a timestamp
    lp = _log_softmax(out[None, :])[0]
    with np.errstate(divide="ignore"):
        ts_mass = lp[ts_begin:]
        ts_lp = (
            -np.inf if np.all(np.isneginf(ts_mass))
            else np.log(np.exp(ts_mass - ts_mass.max()).sum()) + ts_mass.max()
        )
    text_max = lp[:ts_begin].max() if ts_begin > 0 else -np.inf
    if ts_lp > text_max:
        out[:ts_begin] = -np.inf
    return out


def oracle_window_tokens(
    model: OracleWhisper,
    mel: np.ndarray,  # (n_mels, F) for one window
    prompt: List[int],
    eot_id: int,
    suppress_mask: np.ndarray,  # (V,) 0 / -inf
    strategy: str,
    beam_size: int,
    max_depth: int,
    padding: int,
    suppress_until_len: int,
    ts_begin: Optional[int] = None,
    max_initial_ts_idx: int = 50,
) -> List[int]:
    """One window: clip+pad mel, encode once, decode (src/transcribe.rs:148-383).

    Beam drives the generic host_beam.beam_search with a full-recompute
    `next` closure exactly like the reference's beamsearch_next
    (src/transcribe.rs:253-307). Greedy is stepwise argmax with the same
    masking (the repo's live-greedy semantics, decode/greedy.py).

    `ts_begin` enables the timestamp constraints between the suppression
    mask and the log-softmax (oracle_timestamp_rules), mirroring the order
    in decode/greedy.py::_logp / decode/beam.py::_logp.
    """
    enc_ctx = model.cfg.audio_encoder_config.n_audio_ctx
    keep = min(mel.shape[1], enc_ctx - padding)
    mel = np.pad(mel[:, :keep], ((0, 0), (0, padding)))
    enc = model.encode(mel)
    ctx = model.cfg.text_decoder_config.n_text_ctx
    max_len = min(ctx, len(prompt) + max_depth)

    def next_logp(seq: Sequence[int]) -> np.ndarray:
        logits = model.decode(seq, enc)[-1]
        if len(seq) <= suppress_until_len:
            logits = logits + suppress_mask
        if ts_begin is not None:
            logits = oracle_timestamp_rules(
                logits, seq, len(prompt), ts_begin, eot_id,
                max_initial_ts_idx,
            )
        return _log_softmax(logits)

    if strategy == "greedy":
        seq = list(prompt)
        while len(seq) < max_len:
            tok = int(np.argmax(next_logp(seq)))
            seq.append(tok)
            if tok == eot_id:
                break
        return seq

    def next_fn(beams):
        out = []
        for b in beams:
            row = next_logp(b.seq)
            out.append([(t, b.log_prob + row[t]) for t in range(len(row))])
        return out

    return host_beam.beam_search(
        [host_beam.BeamNode(list(prompt), 0.0)],
        next_fn,
        lambda seq: len(seq) > 0 and seq[-1] == eot_id,
        beam_size,
        max_depth,
    )


# ---------------------------------------------------------------------------
# Word-timing oracle: independent median filter, DTW (argmin backtracking,
# no trace array), and word grouping for align.find_word_timings.
# ---------------------------------------------------------------------------


def oracle_median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Median over the last axis, edge-padded — explicit per-element loop."""
    if width <= 1:
        return np.asarray(x, np.float64)
    pad = width // 2
    flat = np.asarray(x, np.float64).reshape(-1, x.shape[-1])
    out = np.empty_like(flat)
    for r in range(flat.shape[0]):
        row = flat[r]
        n = len(row)
        for j in range(n):
            window = [row[min(max(j + k - pad, 0), n - 1)]
                      for k in range(width)]
            window.sort()
            m = len(window)
            out[r, j] = (window[m // 2] if m % 2
                         else 0.5 * (window[m // 2 - 1] + window[m // 2]))
    return out.reshape(x.shape)


def oracle_dtw(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotone min-cost path over (N, M) with steps {diag, down, right}.

    Same math and tie preference (diagonal, then down, then right — by <=
    comparisons on the PREDECESSOR accumulated costs) as align.dtw, but
    backtracks by re-comparing the accumulated-cost matrix instead of
    recording a trace array."""
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf, np.float64)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            acc[i, j] = cost[i - 1, j - 1] + min(
                acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]
            )
    ti, tj = [], []
    i, j = n, m
    while i > 0 and j > 0:
        ti.append(i - 1)
        tj.append(j - 1)
        c_diag, c_down, c_right = acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]
        if c_diag <= c_down and c_diag <= c_right:
            i, j = i - 1, j - 1
        elif c_down <= c_right:
            i -= 1
        else:
            j -= 1
    return np.asarray(ti[::-1]), np.asarray(tj[::-1])


_ORACLE_PREPEND = "\"'\u201c\u00bf([{-"
_ORACLE_APPEND = "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001"


def _oracle_split_words(tokens: Sequence[int], tok):
    """[(word, tokens, positions)]: unicode-complete subwords merged into
    words at leading spaces (the published split_tokens_on_unicode/spaces
    contract, shared with align.split_tokens_on_spaces)."""
    subwords = []
    buf, bufp = [], []
    for i, t in enumerate(tokens):
        t = int(t)
        if tok.is_special(t):
            continue
        buf.append(t)
        bufp.append(i)
        txt = tok.decode(buf, skip_special=True)
        if txt and "\ufffd" not in txt[-1:]:
            subwords.append((txt, buf, bufp))
            buf, bufp = [], []
    if buf:
        txt = tok.decode(buf, skip_special=True)
        if txt.strip():
            subwords.append((txt, buf, bufp))
    words = []
    for txt, toks_, pos in subwords:
        if not words or txt.startswith(" ") or not txt.strip():
            words.append([txt, list(toks_), list(pos)])
        else:
            words[-1][0] += txt
            words[-1][1] += toks_
            words[-1][2] += pos
    return [(w.strip(), t, p) for w, t, p in words if w.strip()]


def oracle_word_timings(
    model: "OracleWhisper",
    tokens: Sequence[int],  # full window sequence (prompt + text + EOT)
    enc: np.ndarray,  # (Sa, d) f64 encoder output
    tok,
    num_frames: int,
    heads: Sequence[Tuple[int, int]],
    medfilt_width: int = 7,
) -> List[Tuple[str, float, float, List[int]]]:
    """Independent f64 pipeline for align.find_word_timings: cross-attention
    weights -> head select -> per-head token-axis normalization -> median
    filter -> head-mean cost -> DTW -> first-visit jump times -> words.
    Returns [(word, start, end, tokens)] on the 20 ms frame grid."""
    toks = [int(t) for t in tokens]
    s = len(toks)
    ws = model.decode_cross_weights(toks, enc)  # (L, H, S, Sa)
    sel = np.stack([ws[l, h] for l, h in heads])
    sel = sel[:, :, : max(num_frames, 2)]
    mean = sel.mean(axis=-2, keepdims=True)
    std = sel.std(axis=-2, keepdims=True) + 1e-8
    sel = (sel - mean) / std
    sel = oracle_median_filter(sel, medfilt_width)
    matrix = sel.mean(axis=0)  # (S, F)

    text_idx, time_idx = oracle_dtw(-matrix)
    jumps = np.full(s + 1, time_idx[-1] + 1, np.int64)
    seen = set()
    for ti, fj in zip(text_idx, time_idx):
        if ti not in seen:
            jumps[ti] = fj
            seen.add(ti)
    start_t = jumps * 0.02

    raw = []
    for word, wtoks, pos in _oracle_split_words(toks, tok):
        t0 = float(start_t[pos[0]])
        t1 = float(start_t[min(pos[-1] + 1, s)])
        raw.append([word, t0, max(t1, t0), list(wtoks)])

    # punctuation merging: forward two-pass with the same semantics as
    # align.merge_punctuations (prepend chains attach to the FOLLOWING
    # word's timing, append chains to the PRECEDING word's)
    merged = []
    pending = []  # consecutive prepend-only words
    for w in raw:
        if w[0] in _ORACLE_PREPEND:
            pending.append(w)
        else:
            for p in reversed(pending):
                w = [p[0] + w[0], w[1], w[2], p[3] + w[3]]
            pending = []
            merged.append(w)
    merged.extend(pending)  # trailing prepend words stay as-is
    out = []
    for w in merged:
        if out and w[0] in _ORACLE_APPEND:
            prev = out[-1]
            out[-1] = [prev[0] + w[0], prev[1], prev[2], prev[3] + w[3]]
        else:
            out.append(w)
    return [(w, s0, e0, t) for w, s0, e0, t in out]


# ---------------------------------------------------------------------------
# Long-form driver: windowing + stitching (src/transcribe.rs:23-138).
# ---------------------------------------------------------------------------


def oracle_find_overlap(
    prev: Sequence[int], curr: Sequence[int], max_n_offsets: int,
    min_n_overlaps: int,
) -> Optional[Tuple[int, int]]:
    """Best suffix(prev)/prefix(curr) alignment (src/transcribe.rs:76-110);
    aligned equal pairs need not be contiguous."""
    best_count, best = 0, None
    for offset in range(min(len(prev), len(curr), max_n_offsets)):
        start = len(prev) - 1 - offset
        tail = prev[start:]
        hits = [j for j in range(min(len(tail), len(curr))) if tail[j] == curr[j]]
        if len(hits) > best_count:
            best_count = len(hits)
            best = (start + hits[0], hits[0])
    return best if best_count >= min_n_overlaps else None


def oracle_waveform_to_text(
    params,
    cfg,
    tokenizer,
    lang: str,
    waveform: np.ndarray,
    sample_rate: int = SAMPLE_RATE,
    task: str = "transcribe",
    strategy: str = "beam",
    beam_size: int = 5,
    max_depth: int = 100,
    padding: int = 10,
    chunk_overlap_seconds: float = 3.0,
    stitch_max_offsets: int = 40,
    stitch_min_overlaps: int = 3,
    suppress_until_len: int = 5,
) -> Tuple[str, List[int], List[str]]:
    """Complete reference pipeline (src/transcribe.rs:23-74) in f64 NumPy.

    Returns (text, tokens, per-chunk texts). Mirrors the repo pipeline's two
    documented divergences from the reference: overlap >= window clamps to
    window//2 (the reference degenerates to 1-sample shifts) and sub-n_fft
    tail windows are skipped (the reference would panic).
    """
    model = OracleWhisper(params, cfg)
    n_mels = cfg.audio_encoder_config.n_mels
    enc_ctx = cfg.audio_encoder_config.n_audio_ctx
    prompt = tokenizer.prompt_ids(lang, task=task)
    eot = tokenizer.eot
    suppress = np.asarray(tokenizer.suppress_mask(), np.float64)

    n_window = oracle_max_waveform_samples(enc_ctx - padding)
    overlap = int(sample_rate * chunk_overlap_seconds)
    if overlap >= n_window:
        overlap = n_window // 2
    shift = max(n_window - overlap, 1)

    tokens: List[int] = []
    chunk_texts: List[str] = []
    n = (max(len(waveform) - 1, 0)) // shift + 1
    for i in range(n):
        start = i * shift
        window = np.asarray(waveform[start: start + n_window], np.float64)
        if len(window) < N_FFT:
            continue
        mel = oracle_prep_audio(window, n_mels)
        new_tokens = oracle_window_tokens(
            model, mel, prompt, eot, suppress, strategy, beam_size,
            max_depth, padding, suppress_until_len,
        )
        spliced = oracle_find_overlap(
            tokens, new_tokens, stitch_max_offsets, stitch_min_overlaps
        )
        if spliced is not None:
            pi, ci = spliced
            tokens = tokens[:pi] + list(new_tokens[ci:])
        else:
            tokens = tokens + list(new_tokens)
        chunk_texts.append(tokenizer.decode(tokens, skip_special=True))

    text = tokenizer.decode(tokens, skip_special=True) if tokens else ""
    return text, tokens, chunk_texts
