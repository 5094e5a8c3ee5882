"""Long-form transcription pipeline: windowing, per-window decode, stitching.

Capability parity with the reference orchestrator (whisper-burn
`src/transcribe.rs`):

  * ~14.9 s windows: `max_waveform_samples(encoder_ctx - 10)` samples per
    window with a 3 s overlap (src/transcribe.rs:32-34,120-123; the
    load-bearing subtlety documented in SURVEY.md §3.6);
  * each window's mel is clipped to (encoder_ctx - padding) frames and
    zero-padded with `padding`=10 frames which "helps whisper determine end
    of text" (src/transcribe.rs:170-177);
  * decode prompt [SOT, lang, transcribe, notimestamps]
    (src/transcribe.rs:201-203); beam=5, max_depth=100
    (src/transcribe.rs:232-233); special tokens suppressed while seq len <= 5
    (src/transcribe.rs:271-275);
  * cross-window token-overlap stitching: best suffix/prefix alignment over
    <= 40 offsets, accepted at >= 3 matches (src/transcribe.rs:76-110);
  * `Chunk {i}: {text}` progress contract (src/transcribe.rs:68);
  * the trailing-context tokens are computed and discarded exactly like the
    reference (the startofprev path is disabled as a hallucination
    workaround, src/transcribe.rs:187-201).

TPU-native differences: the whole per-window compute (mel frontend, encoder,
beam search with KV cache) is jitted on device with one compile per distinct
window length; only final token sequences cross back to the host.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import N_MELS, SAMPLE_RATE, WhisperConfig
from ..models import whisper as M
from ..ops.audio import max_waveform_samples, prep_audio
from ..decode import beam as dbeam
from ..decode import greedy as dgreedy
from . import vad
from ..parallel.context import kernel_mesh
from ..text.tokenizer import WhisperTokenizer
from ..utils.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class DecodeOptions:
    """Decoding knobs; defaults reproduce the reference exactly."""

    lang: str = "en"
    task: str = "transcribe"  # "transcribe" | "translate" (to English)
    strategy: str = "beam"  # "beam" | "greedy"
    beam_size: int = 5  # src/transcribe.rs:232
    max_depth: int = 100  # src/transcribe.rs:233
    padding: int = 10  # zero-pad mel frames (src/transcribe.rs:33,170)
    chunk_overlap_seconds: float = 3.0  # src/transcribe.rs:120
    stitch_max_offsets: int = 40  # src/transcribe.rs:57
    stitch_min_overlaps: int = 3  # src/transcribe.rs:57
    suppress_until_len: int = 5  # src/transcribe.rs:271
    timestamps: bool = False
    max_initial_timestamp: float = 1.0  # s; cap on the first emitted stamp
    kv_quant: bool = False  # cross-KV cache quant: True/"int8", or "int4"
    self_quant: bool = False  # int8 self-KV cache with per-row scales
    # --- robust decoding (OpenAI-style fallback ladder; new capability,
    # the reference decodes once at beam=5 with no quality checks) ---
    # temperature: a float decodes once; a TUPLE enables the fallback
    # ladder: each window decodes at temps[0] (beam/greedy per `strategy`),
    # and re-decodes at the next temperature (always sampling) while the
    # quality checks fail. Checks: gzip compression ratio of the window
    # text > compression_ratio_threshold (repetition loop), or mean sampled
    # token logprob < logprob_threshold. no_speech_threshold (opt-in)
    # accepts a silent window (emits nothing) when p(<|nospeech|>) at SOT
    # exceeds it AND the logprob check failed. The ladder applies to
    # `Transcriber.transcribe`/`transcribe_with_timestamps` AND the batched
    # pipelines (first pass batched at temps[0]; only failed windows
    # re-decode, batched, at the next temperature). Streaming decodes at
    # temps[0] but gates every permanent confirmation on the
    # compression-ratio check (StreamingTranscriber._confirm_ok).
    temperature: object = 0.0  # float | tuple of floats
    compression_ratio_threshold: Optional[float] = 2.4
    logprob_threshold: Optional[float] = -1.0
    no_speech_threshold: Optional[float] = None
    seed: int = 0  # PRNG seed for sampling temperatures
    # Text to condition the decoder on (domain vocabulary, names, style):
    # encoded after <|startofprev|>, capped at n_text_ctx//2 - 1 tokens, and
    # prepended to EVERY window's prompt. New capability beyond the
    # reference (which computes then discards trailing context,
    # src/transcribe.rs:43-50); fixed per-window conditioning keeps one
    # compiled executable per prompt length. Conditioning tokens are
    # stripped from the output.
    initial_prompt: Optional[str] = None
    # Feed each window the previously decoded text as <|startofprev|>
    # context (OpenAI's default long-form behavior). The reference computes
    # then DISCARDS this context as a hallucination workaround
    # (src/transcribe.rs:187-201) -- parity keeps it OFF by default; when
    # on, windows decode sequentially (the prompt depends on the previous
    # window's output, so pipelining is disabled) and conditioning resets
    # after a window that needed a sampling temperature > 0.5 (the standard
    # anti-hallucination rule).
    condition_on_previous_text: bool = False
    # Quantize conditioning-prefix lengths to multiples of this (crop the
    # OLDEST tokens): 1 (default) keeps user text exact; the serving daemon
    # sets 8 so clients cannot mint unbounded distinct prompt shapes (each
    # distinct length is one slow tunnel compile). prev-text context is
    # always bucketed (cropping history is harmless and its length changes
    # every window).
    prompt_length_bucket: int = 1
    # Energy VAD pre-filter (new capability; see pipeline/vad.py): windows
    # with less than vad_min_speech_seconds of frames above vad_threshold_db
    # dBFS are skipped on the host — no encoder/decoder dispatch at all.
    # Conservative by default (-40 dBFS / 100 ms keeps any plausible
    # speech); complements no_speech_threshold, which catches non-silent
    # non-speech but pays for a decode first.
    vad: bool = False
    vad_threshold_db: float = -40.0
    vad_min_speech_seconds: float = 0.1
    # Transcribe only these time ranges: "s0,e0,s1,e1,..." (seconds) or a
    # sequence of floats; an odd count leaves the last clip open-ended.
    # Each clip transcribes independently (texts joined by a space;
    # timestamped segments carry absolute times offset by the clip start).
    # New capability beyond the reference, matching OpenAI's
    # clip_timestamps option.
    clip_timestamps: Optional[object] = None


def parse_clip_timestamps(
    clips: object, total_seconds: float
) -> List[Tuple[float, float]]:
    """"s0,e0,..." or [s0, e0, ...] -> [(start, end)] clamped to the audio.

    An odd count means the final clip runs to the end. Raises ValueError on
    unordered or out-of-range values.
    """
    if isinstance(clips, str):
        vals = [float(x) for x in clips.split(",") if x.strip() != ""]
    else:
        vals = [float(x) for x in clips]
    if not vals:
        return [(0.0, total_seconds)]
    if len(vals) % 2 == 1:
        vals.append(total_seconds)
    out: List[Tuple[float, float]] = []
    prev_end = 0.0
    for s, e in zip(vals[::2], vals[1::2]):
        e = min(e, total_seconds)
        if s < 0 or s >= e:
            raise ValueError(f"bad clip range [{s}, {e}]")
        if s < prev_end:
            raise ValueError("clip ranges must be sorted and disjoint")
        if s >= total_seconds:
            break
        out.append((s, e))
        prev_end = e
    return out


def find_chunk_overlap(
    prev_tokens: Sequence[int],
    curr_tokens: Sequence[int],
    max_n_offsets: int,
    min_n_overlaps: int,
) -> Optional[Tuple[int, int]]:
    """Best suffix(prev)/prefix(curr) token alignment (src/transcribe.rs:76-110).

    Returns (prev_index, curr_index) to splice at, or None. Matching positions
    need not be contiguous -- the reference counts all equal aligned pairs.
    """
    max_overlap = 0
    max_overlap_indices = (0, 0)
    n_offsets = min(len(prev_tokens), len(curr_tokens), max_n_offsets)

    for offset in range(n_offsets):
        prev_start = len(prev_tokens) - 1 - offset
        matches = [
            i
            for i, (old, new) in enumerate(
                zip(prev_tokens[prev_start:], curr_tokens)
            )
            if old == new
        ]
        if len(matches) > max_overlap:
            max_overlap = len(matches)
            curr_idx = matches[0]
            max_overlap_indices = (prev_start + curr_idx, curr_idx)

    if max_overlap >= min_n_overlaps:
        return max_overlap_indices
    return None


def compression_ratio(text: str) -> float:
    """len(utf-8) / len(zlib-compressed): > ~2.4 flags a repetition loop
    (the standard Whisper decode-quality heuristic)."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def evaluate_window_quality(opt: "DecodeOptions", tok, toks, n_sampled,
                            sum_logp, ns_prob):
    """Host-side decode-quality gates for one window (OpenAI's
    needs_fallback logic), shared by the single-stream and batched ladders.

    Returns (ok, silence, avg_logprob, compression_ratio):
      * silence: the no-speech gate fired (p(<|nospeech|>) above threshold
        AND the logprob check failed, or logprob gating is off) -- the
        window should emit nothing;
      * ok: both the logprob and compression-ratio checks passed.
    `ns_prob` < 0 is the "tokenizer has no <|nospeech|>" sentinel and
    disables the silence gate.
    """
    avg_lp = float(sum_logp) / max(int(n_sampled), 1)
    ns = float(ns_prob)
    lp_failed = (opt.logprob_threshold is not None
                 and avg_lp < opt.logprob_threshold)
    if (opt.no_speech_threshold is not None and ns >= 0.0
            and ns > opt.no_speech_threshold
            and (opt.logprob_threshold is None or lp_failed)):
        return False, True, avg_lp, 0.0
    cr = compression_ratio(tok.decode(toks, skip_special=True))
    ok = not lp_failed and not (
        opt.compression_ratio_threshold is not None
        and cr > opt.compression_ratio_threshold)
    return ok, False, avg_lp, cr


def window_waveform(
    waveform: np.ndarray, sample_rate: int, window_samples: int, overlap_samples: int
):
    """Yield (start, end) window bounds (src/transcribe.rs:114-138)."""
    shift = max(window_samples - overlap_samples, 1)
    n = (max(len(waveform) - 1, 0)) // shift + 1
    for i in range(n):
        start = i * shift
        end = min(start + window_samples, len(waveform))
        yield start, end


class Transcriber:
    """Loads once, transcribes many. Holds jitted per-shape window programs."""

    def __init__(
        self,
        params: M.Params,
        cfg: WhisperConfig,
        tokenizer: WhisperTokenizer,
        dtype=None,
        attention: str = "auto",
        matmul_precision: Optional[str] = None,
        mesh=None,
        draft: Optional[Tuple[M.Params, WhisperConfig]] = None,
        draft_k: int = 4,
    ):
        """`matmul_precision`: None (device default: single-pass bf16 MXU for
        f32 on TPU, ~0.2 logit deviation vs exact f32) or "highest"/"float32"
        for the token-exact parity mode (slower; used by the golden E2E gate).

        `mesh`: optional `jax.sharding.Mesh` with ("dp", "tp") axes. Params
        are placed with the Megatron TP rules (replicated over dp); batched
        inputs (BatchTranscriber) are sharded over dp, so one jitted program
        data-parallelizes windows across chips with XLA-inserted collectives.

        `draft`: optional (params, cfg) of a SMALLER model sharing the
        tokenizer (e.g. tiny drafting for large-v2): greedy temperature-0
        windows then decode speculatively (decode/speculative.py) -- the
        draft proposes `draft_k - 1` tokens per target step, the target
        verifies, output tokens unchanged. B=1 latency feature; ignored by
        beam/sampling decodes and the batched pipelines.
        """
        if attention == "auto":
            attention = "flash" if jax.default_backend() == "tpu" else "xla"
        # tp>1 composes with the Pallas kernels via shard_map: every window
        # program traces under parallel/context.kernel_mesh(self.mesh), and
        # the kernel entry points shard over ("dp" batch/windows, "tp"
        # heads) instead of lowering to replicated custom calls
        # (test_parallel.py::TestTpFlashComposition pins token equality
        # against the meshless and xla paths).
        cfg = dataclasses.replace(cfg, attention=attention)
        self._matmul_precision = matmul_precision
        if tokenizer.vocab_size != cfg.text_decoder_config.n_vocab:
            raise ValueError(
                f"tokenizer vocab size {tokenizer.vocab_size} does not match "
                f"model n_vocab {cfg.text_decoder_config.n_vocab} -- wrong "
                "tokenizer.json for this checkpoint?"
            )
        if dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x,
                params,
            )
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel import sharding as psharding

            psharding.validate_tp(cfg, mesh.shape.get("tp", 1))
            self.params = psharding.shard_params(
                jax.tree.map(jnp.asarray, params), mesh, cfg
            )
            self._batch_sharding = NamedSharding(
                mesh, psharding.batch_pspec()
            )
        else:
            self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.tok = tokenizer
        self._suppress = jnp.asarray(tokenizer.suppress_mask())
        # timestamped decoding keeps timestamp tokens OUT of the suppress
        # set (they must be emittable; the in-graph timestamp rules govern
        # them instead) -- matching OpenAI Whisper's suppress list.
        try:
            self._ts_begin: Optional[int] = tokenizer.timestamp_begin
            m = np.asarray(tokenizer.suppress_mask()).copy()
            m[self._ts_begin:] = 0.0
            self._suppress_ts = jnp.asarray(m)
        except KeyError:
            self._ts_begin = None
            self._suppress_ts = self._suppress
        self._draft_params = None
        self._draft_cfg: Optional[WhisperConfig] = None
        self._draft_k = int(draft_k)
        if draft is not None:
            d_params, d_cfg = draft
            if mesh is not None:
                raise ValueError(
                    "draft= does not compose with mesh= yet: speculative "
                    "decoding is the B=1 single-chip latency path"
                )
            if d_cfg.text_decoder_config.n_vocab != cfg.text_decoder_config.n_vocab:
                raise ValueError(
                    "draft model vocab "
                    f"{d_cfg.text_decoder_config.n_vocab} != target vocab "
                    f"{cfg.text_decoder_config.n_vocab} -- the draft must "
                    "share the tokenizer (e.g. multilingual tiny for "
                    "large-v2, NOT tiny.en)"
                )
            if d_cfg.n_mels != cfg.n_mels:
                raise ValueError(
                    f"draft n_mels {d_cfg.n_mels} != target n_mels "
                    f"{cfg.n_mels}: both models must consume the same mel "
                    "frontend"
                )
            if self._draft_k < 1:
                raise ValueError("draft_k must be >= 1")
            d_cfg = dataclasses.replace(d_cfg, attention=attention)
            if dtype is not None:
                d_params = jax.tree.map(
                    lambda x: x.astype(dtype)
                    if np.issubdtype(x.dtype, np.floating) else x,
                    d_params,
                )
            # device arrays up front: the window programs close over the
            # draft pytree (the jitted signature stays (params, wave,
            # prompt, suppress)); closing over HOST arrays would re-stage
            # them per trace (CLAUDE.md closed-over-operand gotcha) -- the
            # draft is small, but keep it on device regardless
            self._draft_params = jax.tree.map(jnp.asarray, d_params)
            self._draft_cfg = d_cfg
        # per-instance jit cache (a functools.lru_cache on the method would
        # key on `self` at class level and pin every Transcriber forever --
        # a real leak under the serving daemon)
        self._fn_cache: dict = {}

    # ------------------------------------------------------------------
    def _build_prompt(self, opt: "DecodeOptions", prev_tokens=()):
        """Decode prompt ids for `opt`, plus the conditioning-prefix length.

        With `opt.initial_prompt` (and/or `prev_tokens`, the
        condition_on_previous_text context), the prompt becomes
        [<|startofprev|>, *initial_prompt_tokens, *prev_tokens][-cap:] +
        standard prompt (cap = n_text_ctx//2 - 1, OpenAI's window).
        Returns (ids (P,) i32, n_cond) -- callers strip the first n_cond
        tokens from each window's output and widen the suppression window
        by n_cond so the rule stays relative to the first sampled position
        (reference: seq_len <= 5 against a 4-token prompt,
        src/transcribe.rs:271-275).
        """
        ids = self.tok.prompt_ids(
            opt.lang, task=opt.task, timestamps=opt.timestamps)
        n_cond = 0
        text = []
        if opt.initial_prompt:
            text += self.tok.encode(" " + opt.initial_prompt.strip())
        text += [int(t) for t in prev_tokens]
        if text:
            cap = self.cfg.decoder_ctx_size // 2 - 1
            # crop the TEXT from the left (keep the marker: a prompt that
            # begins with raw text and no <|startofprev|> is out of
            # distribution). Lengths are quantized down to a multiple of
            # the bucket (cropping the OLDEST tokens) when prev-text
            # context is present -- its length changes every window, and
            # each distinct prompt length is one compiled executable -- or
            # when opt.prompt_length_bucket asks for it (the serving
            # daemon's compile-DoS bound). A bare initial_prompt stays
            # exact by default.
            text = text[-(cap - 1):]
            bucket = max(int(opt.prompt_length_bucket), 8 if prev_tokens else 1)
            if bucket > 1 and len(text) > bucket:
                text = text[len(text) % bucket:]
            cond = [self.tok.start_of_prev] + text
            ids = cond + ids
            n_cond = len(cond)
        return jnp.asarray(ids, jnp.int32), n_cond

    # ------------------------------------------------------------------
    def _prec_ctx(self):
        """Matmul-precision context for decode programs (token-exact parity
        mode uses "highest"; None = device default)."""
        import contextlib

        return (
            jax.default_matmul_precision(self._matmul_precision)
            if self._matmul_precision else contextlib.nullcontext()
        )

    # ------------------------------------------------------------------
    def _decode_window_ladder(self, i, window, prompt, n_cond, sup_len, opt,
                              temps, prec_ctx, timestamps=False,
                              max_initial_ts_idx=50):
        """Fallback ladder (new capability): decode at temps[0]; while the
        quality checks fail, re-decode at the next (sampling) temperature.
        Returns (final stripped token list, accepted temperature,
        (avg_logprob, compression_ratio, no_speech_prob) of the accepted
        rung); tokens == [] means accepted as silence under the no-speech
        gate."""
        tok = self.tok
        P = int(prompt.shape[0])
        suppress = self._suppress_ts if timestamps else self._suppress
        for ti, T in enumerate(temps):
            fn = self._window_fn(
                len(window), P, opt.strategy, opt.beam_size,
                opt.max_depth, opt.padding, sup_len, opt.kv_quant,
                opt.self_quant, timestamps=timestamps,
                max_initial_ts_idx=max_initial_ts_idx, temperature=T,
                quality=True, sot_pos=n_cond,
            )
            rng = jax.random.fold_in(
                jax.random.PRNGKey(opt.seed), i * 131 + ti)
            with prec_ctx:
                toks_dev, length, logp, ns = fn(
                    self.params, jnp.asarray(window), prompt, suppress, rng,
                )
            length = int(length)
            toks = [int(t) for t in np.asarray(toks_dev)[:length]][n_cond:]
            ok, silence, avg_lp, cr = evaluate_window_quality(
                opt, tok, toks, length - P, logp, ns)
            meta = (avg_lp, cr, float(ns) if float(ns) >= 0.0 else None)
            if silence:
                log.info("chunk %d: no speech (p=%.2f), skipping",
                         i, float(ns))
                return [], T, meta
            if ok or ti == len(temps) - 1:
                if ti:
                    log.info("chunk %d: accepted at temperature %.1f "
                             "(avg_logprob %.2f, compression %.2f)",
                             i, T, avg_lp, cr)
                return toks, T, meta
            log.info("chunk %d: t=%.1f failed checks (avg_logprob %.2f, "
                     "compression %.2f), retrying", i, T, avg_lp, cr)
        return toks, T, meta  # pragma: no cover (loop always returns)

    @staticmethod
    def _ladder_temps(opt):
        """(temps tuple, ladder active?) from DecodeOptions.temperature."""
        temps = (
            tuple(float(t) for t in opt.temperature)
            if isinstance(opt.temperature, (tuple, list))
            else (float(opt.temperature),)
        )
        active = (len(temps) > 1 or temps[0] != 0.0
                  or opt.no_speech_threshold is not None)
        return temps, active

    # ------------------------------------------------------------------
    def _window_fn(
        self, n_samples: int, prompt_len: int, strategy: str, beam_size: int,
        max_depth: int, padding: int, suppress_until_len: int,
        kv_quant: bool = False, self_quant: bool = False,
        timestamps: bool = False, max_initial_ts_idx: int = 50,
        temperature: float = 0.0, quality: bool = False, sot_pos: int = 0,
    ) -> Callable:
        """One jitted program: waveform window -> (tokens, length).

        Compiled per distinct (window length, options); the full-size window
        dominates, so steady state reuses a single executable. With
        `timestamps`, the decode loops run the in-graph timestamp logit
        constraints (decode/beam.apply_timestamp_rules).

        `quality=True` (the fallback-ladder variant) changes the signature
        to (params, wave, prompt, suppress, rng) -> (tokens, length,
        sum_logp, ns_prob): ns_prob = p(<|nospeech|>) at the SOT position
        (or -1 when the tokenizer lacks the token), and `temperature > 0`
        forces sampling (greedy machinery), matching OpenAI's ladder.
        """
        # greedy temperature-0 windows take the speculative path when a
        # draft model is attached (B=1 only; the batched programs live in
        # _batch_window_fn and never see this)
        spec = (self._draft_cfg is not None and strategy == "greedy"
                and temperature == 0.0)
        if spec:
            # the verify step needs n_draft rows of context headroom past
            # max_depth; an oversized conditioning prompt falls back to the
            # plain greedy loop rather than erroring (prompt_len is static
            # per compiled program, so this is a trace-time decision)
            ctx_room = min(self.cfg.text_decoder_config.n_text_ctx,
                           self._draft_cfg.text_decoder_config.n_text_ctx)
            spec = prompt_len + max_depth + self._draft_k <= ctx_room
        key = ("window", n_samples, prompt_len, strategy, beam_size,
               max_depth, padding, suppress_until_len, kv_quant, self_quant,
               timestamps, max_initial_ts_idx, temperature, quality, sot_pos,
               spec and self._draft_k)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        enc_ctx = cfg.encoder_ctx_size
        eot = self.tok.eot
        mesh = self.mesh
        # Fused-kernel selection is left to the decode loops (dp-meshed
        # fused beam is token-identical on the virtual mesh,
        # test_parallel.py::TestShardedFusedBeam; tp>1 composes via the
        # kernel shard_maps, active while `run` traces under kernel_mesh).
        ts_begin = None
        if timestamps:
            if self._ts_begin is None:
                raise ValueError(
                    "timestamps=True but the tokenizer has no timestamp "
                    "tokens (<|0.00|>...)"
                )
            ts_begin = self._ts_begin
        ns_id = None
        if quality:
            from ..text.tokenizer import SpecialToken

            ns_id = self.tok.special_token(SpecialToken.NO_SPEECH)

        def run(params, wave, prompt, suppress, rng=None):
            # kernel_mesh is read at TRACE time by the Pallas kernel entry
            # points (parallel/context): meshed programs shard_map the
            # kernels instead of lowering replicated custom calls.
            with kernel_mesh(mesh):
                mel = prep_audio(wave[None, :], n_mels=cfg.n_mels)
                n_frames = mel.shape[2]
                keep = min(n_frames, enc_ctx - padding)
                mel = mel[:, :, :keep]
                mel = jnp.pad(mel, ((0, 0), (0, 0), (0, padding)))  # 10 frames
                enc = M.encoder_forward(params, mel, cfg)
                if strategy == "beam" and temperature == 0.0:
                    out = dbeam.beam_search(
                        params, enc, prompt, cfg, eot_id=eot,
                        suppress_mask=suppress, beam_size=beam_size,
                        max_depth=max_depth,
                        suppress_until_len=suppress_until_len,
                        kv_quant=kv_quant, self_quant=self_quant,
                        ts_begin=ts_begin,
                        max_initial_ts_idx=max_initial_ts_idx,
                        nospeech_id=ns_id if quality else None,
                        sot_pos=sot_pos,
                    )
                    if not quality:
                        return out[0], out[1]
                    ns = out[3] if ns_id is not None else jnp.float32(-1.0)
                    return out[0], out[1], out[2], ns
                if spec:
                    from ..decode import speculative as dspec

                    enc_d = M.encoder_forward(
                        self._draft_params, mel, self._draft_cfg)
                    out = dspec.speculative_greedy_decode(
                        params, enc, prompt, cfg, eot_id=eot,
                        draft_params=self._draft_params, draft_enc_out=enc_d,
                        draft_cfg=self._draft_cfg,
                        suppress_mask=suppress, n_draft=self._draft_k,
                        max_depth=max_depth,
                        suppress_until_len=suppress_until_len,
                        kv_quant=kv_quant, self_quant=self_quant,
                        ts_begin=ts_begin,
                        max_initial_ts_idx=max_initial_ts_idx,
                        nospeech_id=ns_id if quality else None,
                        sot_pos=sot_pos,
                    )
                else:
                    out = dgreedy.greedy_decode(
                        params, enc, prompt, cfg, eot_id=eot,
                        suppress_mask=suppress,
                        max_depth=max_depth,
                        suppress_until_len=suppress_until_len,
                        kv_quant=kv_quant, self_quant=self_quant,
                        ts_begin=ts_begin,
                        max_initial_ts_idx=max_initial_ts_idx,
                        temperature=temperature, rng=rng,
                        nospeech_id=ns_id if quality else None,
                        sot_pos=sot_pos,
                    )
                if not quality:
                    return out[0][0], out[1][0]
                ns = out[3][0] if ns_id is not None else jnp.float32(-1.0)
                return out[0][0], out[1][0], out[2][0], ns

        fn = jax.jit(run)
        self._fn_cache[key] = fn
        return fn

    # ------------------------------------------------------------------
    def align_words(
        self,
        window: np.ndarray,  # one window of 16 kHz mono audio
        tokens: Sequence[int],  # that window's decoded sequence (w/ prompt)
        heads=None,  # [(layer, head)] alignment heads; default: top half
        offset_s: float = 0.0,  # added to the returned (window-rel.) times
    ):
        """Word-level timestamps for one decoded window (new capability):
        cross-attention DTW alignment (align.find_word_timings) of `tokens`
        against the window audio. Returns [WordTiming] with absolute times
        when `offset_s` is the window's stream offset."""
        import dataclasses as _dc

        from ..align import find_word_timings
        from ..ops.audio import num_frames as _nf

        cfg = self.cfg
        padding = 10
        mel = prep_audio(
            jnp.asarray(np.asarray(window, np.float32))[None, :],
            n_mels=cfg.n_mels)
        keep = min(mel.shape[2], cfg.encoder_ctx_size - padding)
        valid = keep // 2  # encoder halves the frame count
        mel = jnp.pad(mel[:, :, :keep], ((0, 0), (0, 0), (0, padding)))
        enc = M.encoder_forward(
            self.params, mel.astype(self.params["decoder"]["tok_emb"].dtype),
            cfg)
        words = find_word_timings(
            self.params, enc, list(map(int, tokens)), cfg, self.tok,
            num_frames=valid, heads=heads,
        )
        if offset_s:
            words = [
                _dc.replace(w, start=w.start + offset_s,
                            end=w.end + offset_s)
                for w in words
            ]
        return words

    # ------------------------------------------------------------------
    def detect_language(self, waveform: np.ndarray,
                        sample_rate: int = SAMPLE_RATE,
                        vote_windows: int = 1,
                        vad_threshold_db: float = -40.0,
                        vad_min_speech_seconds: float = 0.1):
        """Identify the spoken language. Returns (best code, {code: prob}).

        New capability: the reference requires the language up front
        (src/bin/transcribe/main.rs:97-105). The audio is scanned window by
        window with the energy VAD for SPEECH-BEARING windows -- audio with
        leading music/silence no longer misdetects off dead air -- and the
        language distribution is averaged over up to `vote_windows` of
        them. Falls back to the first window when everything is below the
        VAD threshold.
        """
        from .detect import detect_language as _detect

        n_window = max_waveform_samples(self.cfg.encoder_ctx_size - 10)
        wave = np.asarray(waveform, np.float32)
        if len(wave) < 400:
            raise ValueError("audio too short for language detection")

        starts: List[int] = []
        for s0 in range(0, len(wave), n_window):
            win = wave[s0 : s0 + n_window]
            if len(win) < 400:
                break
            if not vad.is_silent(win, sample_rate, vad_threshold_db,
                                 vad_min_speech_seconds):
                starts.append(s0)
                if len(starts) >= max(1, int(vote_windows)):
                    break
        if not starts:
            starts = [0]  # all silent: the first window is as good as any

        acc: dict = {}
        for s0 in starts:
            window = wave[s0 : s0 + n_window]
            mel = prep_audio(
                jnp.asarray(window)[None, :], n_mels=self.cfg.n_mels)
            enc = M.encoder_forward(self.params, mel.astype(
                self.params["decoder"]["tok_emb"].dtype), self.cfg)
            _, dist = _detect(self.params, enc, self.cfg, self.tok)[0]
            for code, p in dist.items():
                acc[code] = acc.get(code, 0.0) + p / len(starts)
        best = max(acc, key=acc.get)
        return best, acc

    # ------------------------------------------------------------------
    def transcribe(
        self,
        waveform: np.ndarray,
        sample_rate: int = SAMPLE_RATE,
        options: Optional[DecodeOptions] = None,
        on_chunk: Optional[Callable[[int, str], None]] = None,
    ) -> Tuple[str, List[int]]:
        """Full long-form pipeline: `waveform_to_text` parity
        (src/transcribe.rs:23-74). Returns (text, tokens)."""
        opt = options or DecodeOptions()
        if opt.clip_timestamps is not None:
            return self._transcribe_clips(waveform, sample_rate, opt,
                                          on_chunk)
        cfg = self.cfg
        tok = self.tok

        n_window = max_waveform_samples(cfg.encoder_ctx_size - opt.padding)
        overlap = int(sample_rate * opt.chunk_overlap_seconds)
        if overlap >= n_window:
            # The reference clamps shift to 1 sample here (saturating_sub +
            # max(1), src/transcribe.rs:122), which degenerates into one
            # window per sample. Only reachable with absurdly small encoder
            # contexts; clamp the overlap instead and say so.
            log.warning(
                "chunk overlap (%d samples) >= window (%d); clamping overlap "
                "to half a window", overlap, n_window,
            )
            overlap = n_window // 2
        prompt, n_cond = self._build_prompt(opt)
        sup_len = opt.suppress_until_len + n_cond
        temps, use_ladder = self._ladder_temps(opt)
        cond_prev = opt.condition_on_previous_text

        tokens: List[int] = []
        text = ""
        total_t0 = time.perf_counter()
        prec_ctx = self._prec_ctx()

        # Window pipelining: windows are data-independent (the reference
        # computes then DISCARDS the trailing context, src/transcribe.rs:
        # 43-50,195-201 -- reproduced below), so window i+1 is DISPATCHED
        # before window i's result is fetched. XLA dispatch is async: the
        # device starts i+1 while the host fetches/stitches i, hiding the
        # device->host tunnel latency and host-side stitching per window.
        # condition_on_previous_text anti-hallucination: tokens before this
        # index never re-enter the prompt (OpenAI's prompt_reset_since --
        # a permanent cut, not a one-window skip: a hallucinated window's
        # text must not resurface two windows later)
        prompt_reset_at = 0
        reset_pending = False

        def dispatch(i, start, end):
            nonlocal reset_pending
            window = np.ascontiguousarray(waveform[start:end], dtype=np.float32)
            if len(window) < 400:  # < n_fft: STFT impossible (the reference
                # would panic on its assert, src/audio.rs:292; we skip).
                log.warning("skipping %d-sample tail window (< n_fft)", len(window))
                return None
            if opt.vad and vad.is_silent(
                window, sample_rate, opt.vad_threshold_db,
                opt.vad_min_speech_seconds,
            ):
                log.info("chunk %d: silent window skipped by VAD", i)
                return None
            if cond_prev:
                # previously decoded non-special tokens become the
                # <|startofprev|> context (OpenAI's long-form default; the
                # reference computes then discards this -- see DecodeOptions).
                # Pipelining is off in this mode (PIPELINE_DEPTH=1 below),
                # so `tokens` is final up to the previous window here.
                prev_ctx = [
                    t for t in tokens[prompt_reset_at:]
                    if not tok.is_special(t)
                ]
                prompt_i, n_cond_i = self._build_prompt(
                    opt, prev_tokens=prev_ctx)
                sup_i = opt.suppress_until_len + n_cond_i
            else:
                prompt_i, n_cond_i, sup_i = prompt, n_cond, sup_len
            if use_ladder:  # synchronous: quality checks gate each window
                toks, accepted_t, _meta = self._decode_window_ladder(
                    i, window, prompt_i, n_cond_i, sup_i, opt, temps,
                    prec_ctx)
                # a window that needed a high sampling temperature is an
                # unreliable context: everything up to and including it is
                # cut from future prompts (applied after its drain appends)
                reset_pending = accepted_t > 0.5
                return (i, start, end, toks, None, n_cond_i,
                        time.perf_counter())
            fn = self._window_fn(
                len(window), int(prompt_i.shape[0]), opt.strategy,
                opt.beam_size, opt.max_depth, opt.padding, sup_i,
                opt.kv_quant, opt.self_quant,
            )
            with prec_ctx:
                toks_dev, length = fn(
                    self.params, jnp.asarray(window), prompt_i, self._suppress
                )
            return (i, start, end, toks_dev, length, n_cond_i,
                    time.perf_counter())

        windows = list(window_waveform(waveform, sample_rate, n_window, overlap))
        pending = []
        # conditioning makes window i+1 depend on window i's TEXT: no overlap
        PIPELINE_DEPTH = 1 if cond_prev else 2

        def drain_one():
            nonlocal tokens, text, prompt_reset_at, reset_pending
            i, start, end, toks_dev, length, n_cond_i, t0 = pending.pop(0)
            # trailing non-special context: computed then DISCARDED, exactly
            # like the reference (src/transcribe.rs:43-50,195-201) -- unless
            # condition_on_previous_text feeds it forward (dispatch above).
            _prev_ctx = [t for t in reversed(tokens) if not tok.is_special(t)][:5][::-1]
            if isinstance(toks_dev, list):  # ladder path: already final
                new_tokens = toks_dev
            else:
                new_tokens = [
                    int(t) for t in np.asarray(toks_dev)[: int(length)]
                ][n_cond_i:]  # drop the conditioning prefix

            spliced = find_chunk_overlap(
                tokens, new_tokens, opt.stitch_max_offsets, opt.stitch_min_overlaps
            )
            if spliced is not None:
                prev_index, curr_index = spliced
                tokens = tokens[:prev_index] + new_tokens[curr_index:]
            else:
                tokens.extend(new_tokens)

            if reset_pending:  # cut this window's text out of future prompts
                prompt_reset_at = len(tokens)
                reset_pending = False

            text = tok.decode(tokens, skip_special=True)
            dt = time.perf_counter() - t0
            window_sec = (end - start) / sample_rate
            log.info(
                "chunk %d: %.1fs audio in %.2fs (%.1fx RT), %d tokens",
                i, window_sec, dt, window_sec / dt if dt > 0 else 0.0,
                len(new_tokens),
            )
            if on_chunk is not None:
                on_chunk(i, text)
            else:
                print(f"Chunk {i}: {text}\n")  # src/transcribe.rs:68 contract

        for i, (start, end) in enumerate(windows):
            item = dispatch(i, start, end)
            if item is not None:
                pending.append(item)
            while len(pending) >= PIPELINE_DEPTH:
                drain_one()
        while pending:
            drain_one()

        total = time.perf_counter() - total_t0
        audio_sec = len(waveform) / sample_rate
        log.info(
            "transcribed %.1fs audio in %.2fs (%.1fx RT)",
            audio_sec, total, audio_sec / total if total > 0 else 0.0,
        )
        return text, tokens

    # ------------------------------------------------------------------
    def _transcribe_clips(self, waveform, sample_rate, opt, on_chunk):
        """clip_timestamps: transcribe each range independently and join.

        Each clip is a full long-form pass over its slice (windowing,
        stitching, ladder all apply within the clip)."""
        ranges = parse_clip_timestamps(
            opt.clip_timestamps, len(waveform) / sample_rate)
        sub = dataclasses.replace(opt, clip_timestamps=None)
        texts: List[str] = []
        tokens: List[int] = []
        for s, e in ranges:
            clip = waveform[int(s * sample_rate): int(e * sample_rate)]
            text, toks = self.transcribe(clip, sample_rate, sub, on_chunk)
            if text.strip():
                texts.append(text.strip())
            tokens.extend(toks)
        return " ".join(texts), tokens

    def _transcribe_clips_with_timestamps(self, waveform, sample_rate, opt,
                                          word_timestamps):
        """clip_timestamps for the timestamped path: segment (and word)
        times are offset by each clip's start, so they stay absolute in the
        ORIGINAL audio's timeline."""
        from ..align import WordTiming

        ranges = parse_clip_timestamps(
            opt.clip_timestamps, len(waveform) / sample_rate)
        sub = dataclasses.replace(opt, clip_timestamps=None)
        texts: List[str] = []
        segments: List = []
        for s, e in ranges:
            clip = waveform[int(s * sample_rate): int(e * sample_rate)]
            text, segs = self.transcribe_with_timestamps(
                clip, sample_rate, sub, word_timestamps=word_timestamps)
            if text.strip():
                texts.append(text.strip())
            for seg in segs:
                seg = dataclasses.replace(
                    seg, start=seg.start + s, end=seg.end + s,
                    words=None if seg.words is None else [
                        WordTiming(w.word, w.start + s, w.end + s, w.tokens)
                        for w in seg.words
                    ])
                segments.append(seg)
        return " ".join(texts), segments

    # ------------------------------------------------------------------
    def transcribe_with_timestamps(
        self,
        waveform: np.ndarray,
        sample_rate: int = SAMPLE_RATE,
        options: Optional[DecodeOptions] = None,
        word_timestamps: bool = False,
    ):
        """Timestamped transcription: returns (text, segments).

        New capability (the reference always decodes with <|notimestamps|>,
        src/transcribe.rs:203): the prompt omits <|notimestamps|>, the
        in-graph timestamp rules (decode/beam.apply_timestamp_rules) govern
        the emitted <|x.xx|> tokens, and each window's tokens are split into
        [Segment(start, end, text)] with absolute times (window offset + x.xx,
        pipeline/segments.py). Overlapping windows are joined by the SAME
        token-overlap stitcher as the plain path (find_chunk_overlap,
        src/transcribe.rs:76-110 semantics), with segments trimmed at the
        exact splice index -- no boundary segment is silently dropped or
        duplicated (segments.TimestampStitcher, shared with the batched
        path so both produce identical segments).
        """
        from .segments import TimestampStitcher

        opt = dataclasses.replace(options or DecodeOptions(), timestamps=True)
        if opt.clip_timestamps is not None:
            return self._transcribe_clips_with_timestamps(
                waveform, sample_rate, opt, word_timestamps)
        cfg, tok = self.cfg, self.tok
        n_window = max_waveform_samples(cfg.encoder_ctx_size - opt.padding)
        overlap = int(sample_rate * opt.chunk_overlap_seconds)
        if overlap >= n_window:
            overlap = n_window // 2
        prompt, n_cond = self._build_prompt(opt)
        sup_len = opt.suppress_until_len + n_cond
        temps, use_ladder = self._ladder_temps(opt)
        max_ts_idx = max(0, int(round(opt.max_initial_timestamp / 0.02)))
        prec_ctx = self._prec_ctx()
        cond_prev = opt.condition_on_previous_text
        prompt_reset_at = 0  # see transcribe(): OpenAI prompt_reset_since

        stitcher = TimestampStitcher(
            tok, opt.stitch_max_offsets, opt.stitch_min_overlaps)
        for i, (start, end) in enumerate(
            window_waveform(waveform, sample_rate, n_window, overlap)
        ):
            window = np.ascontiguousarray(waveform[start:end], dtype=np.float32)
            if len(window) < 400:
                continue
            if opt.vad and vad.is_silent(
                window, sample_rate, opt.vad_threshold_db,
                opt.vad_min_speech_seconds,
            ):
                log.info("chunk %d: silent window skipped by VAD", i)
                continue
            if cond_prev:
                prev_ctx = [
                    t for t in stitcher.all_tokens[prompt_reset_at:]
                    if not tok.is_special(t)
                ]
                prompt, n_cond = self._build_prompt(opt, prev_tokens=prev_ctx)
                sup_len = opt.suppress_until_len + n_cond
            if use_ladder:
                # temperature fallback + quality gates, same semantics as
                # the plain path (timestamped variant of the window fn)
                new_tokens, accepted_t, meta = self._decode_window_ladder(
                    i, window, prompt, n_cond, sup_len, opt, temps,
                    prec_ctx, timestamps=True, max_initial_ts_idx=max_ts_idx)
                if accepted_t > 0.5:  # unreliable context: cut permanently
                    prompt_reset_at = None  # resolved after stitching below
            else:
                # quality=True also off the ladder: segments carry
                # avg_logprob / compression_ratio / no_speech_prob so
                # consumers can filter low-confidence output
                fn = self._window_fn(
                    len(window), int(prompt.shape[0]), opt.strategy,
                    opt.beam_size, opt.max_depth, opt.padding, sup_len,
                    opt.kv_quant, opt.self_quant,
                    timestamps=True, max_initial_ts_idx=max_ts_idx,
                    quality=True, sot_pos=n_cond,
                )
                with prec_ctx:
                    toks_dev, length, logp, ns = fn(
                        self.params, jnp.asarray(window), prompt,
                        self._suppress_ts)
                length = int(length)
                new_tokens = [
                    int(t) for t in np.asarray(toks_dev)[:length]
                ][n_cond:]  # drop the conditioning prefix
                P = int(prompt.shape[0])
                meta = (
                    float(logp) / max(length - P, 1),
                    compression_ratio(
                        tok.decode(new_tokens, skip_special=True)),
                    float(ns) if float(ns) >= 0.0 else None,
                )
            stitcher.add_window(
                new_tokens, start / sample_rate, (end - start) / sample_rate,
                quality=meta)

            if prompt_reset_at is None:  # this window was accepted at a
                # high sampling temperature: cut it from future prompts
                prompt_reset_at = len(stitcher.all_tokens)

        segs = stitcher.segments
        if word_timestamps and segs:
            self._attach_words(waveform, sample_rate, segs, opt)
        text = " ".join(s.text.strip() for s in segs)
        return text, segs

    def _attach_words(self, waveform, sample_rate, segs, opt) -> None:
        """Populate each segment's .words via cross-attention DTW
        (align.py): ONE alignment pass per decode window -- segments are
        grouped by the window containing their start, the window's
        concatenated tokens align once, and words are assigned back in
        token order."""
        n_window = max_waveform_samples(self.cfg.encoder_ctx_size
                                        - opt.padding)
        prompt_ids = self.tok.prompt_ids(
            opt.lang, task=opt.task, timestamps=True)
        groups: dict = {}
        for si, seg in enumerate(segs):
            w0 = min(int(seg.start * sample_rate),
                     max(0, len(waveform) - n_window))
            groups.setdefault(w0, []).append(si)
        for w0, sis in groups.items():
            seq = list(prompt_ids)
            for si in sis:
                seq += segs[si].tokens
            seq.append(self.tok.eot)
            words = self.align_words(
                waveform[w0 : w0 + n_window], seq,
                offset_s=w0 / sample_rate)
            it = iter(words)
            for si in sis:
                n_tok = len([x for x in segs[si].tokens
                             if not self.tok.is_special(x)])
                got, used = [], 0
                for w in it:
                    got.append(w)
                    used += len(w.tokens)
                    if used >= n_tok:
                        break
                segs[si].words = got


def waveform_to_text(
    params: M.Params,
    cfg: WhisperConfig,
    tokenizer: WhisperTokenizer,
    lang: str,
    waveform: np.ndarray,
    sample_rate: int,
    **kwargs,
) -> Tuple[str, List[int]]:
    """One-shot functional entry matching the reference signature
    (`waveform_to_text(whisper, bpe, lang, waveform, sample_rate)`,
    src/transcribe.rs:23-29)."""
    opts = DecodeOptions(lang=lang, **kwargs)
    return Transcriber(params, cfg, tokenizer).transcribe(
        waveform, sample_rate, opts
    )
