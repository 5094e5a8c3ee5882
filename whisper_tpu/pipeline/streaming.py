"""Streaming (incremental) transcription with local-agreement confirmation.

New capability beyond the reference (whisper-burn is strictly offline --
`mels_to_text` consumes a complete file, src/transcribe.rs:148): audio
arrives in arbitrary-size blocks, each decode re-transcribes the current
audio buffer, and a segment becomes CONFIRMED once two consecutive decodes
agree on its text (the LocalAgreement-2 policy from the whisper-streaming
line of work). Confirmed text never changes afterwards, so consumers can
render it immediately; the unstable tail is re-decoded as audio grows.

TPU-first: every decode runs the SAME fixed-shape window program -- the
buffer is zero-padded to the full ~14.9 s window -- so an entire stream is
served by ONE compiled executable (no shape-dependent recompiles at push
time; `Transcriber._window_fn`'s cache holds a single entry). Timestamped
decoding (pipeline/segments.py) provides the segment boundaries used for
agreement and for trimming confirmed audio off the buffer.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from . import vad
from .segments import Segment, segments_from_tokens
from .transcribe import (
    SAMPLE_RATE,
    DecodeOptions,
    Transcriber,
    compression_ratio,
)
from ..config import HOP_LENGTH
from ..ops.audio import max_waveform_samples
from ..utils.logging import get_logger

log = get_logger(__name__)


class StreamDecodeBatcher:
    """Batches CONCURRENT streaming sessions' window decodes into one
    fixed-shape batched program call.

    The round-3 streaming study (docs/PERFORMANCE.md) measured B=1 decodes
    leaving the chip ~99% idle per step and concurrent sessions queueing
    behind each other (p95 degrading with session count). Sessions that
    decode within `max_wait_s` of each other now ride ONE batched window
    program (the same `_batch_window_fn` the offline batch pipeline uses;
    batched == single tokens is pinned by tests), so N live sessions cost
    ~one decode of batch N instead of N serialized decodes.

    Sessions submit via `decode()` (blocking); a daemon thread groups
    same-options submissions up to `batch_size`. Requests with different
    decode options/prompts batch only among themselves.
    """

    def __init__(self, transcriber, batch_size: int = 8,
                 max_wait_s: float = 0.1):
        # max_wait_s: the coalescing window. Too short and sessions convoy
        # into sub-batches (30 ms measured avg group 2.0 of 4; 150 ms got
        # 3.9 of 4 -- the post-decode host work between a session's decodes
        # is tens of ms). The wait is only paid when a decode is pending,
        # and is small against the ~1 s decode cadence of live sessions.
        if not hasattr(transcriber, "_batch_window_fn"):
            raise TypeError(
                "StreamDecodeBatcher needs a BatchTranscriber "
                "(the batched window program lives there)")
        self.t = transcriber
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_s)
        self._q: "queue.Queue" = queue.Queue()
        self._started = False
        self._start_lock = threading.Lock()
        self.batches = 0  # telemetry: batched calls issued
        self.batched_requests = 0
        # Optional client count, maintained by the session registry
        # (serve.StreamSessions): with <= 1 known client the coalescing
        # wait is skipped -- a lone session must not pay max_wait_s per
        # decode for partners that cannot exist. None = unknown (library
        # callers): always wait.
        self.clients: int | None = None

    def _ensure_started(self) -> None:
        with self._start_lock:
            if not self._started:
                threading.Thread(target=self._run, daemon=True).start()
                self._started = True

    def decode(self, window: np.ndarray, prompt, suppress, key: tuple):
        """Submit one window; blocks until the batched call returns.
        Returns (tokens_row (ctx,) np.int32, length int)."""
        self._ensure_started()
        item = {
            "window": np.asarray(window, np.float32),
            "prompt": prompt,
            "suppress": suppress,
            "key": key,
            "done": threading.Event(),
            "out": None,
            "err": None,
        }
        self._q.put(item)
        item["done"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def _run(self) -> None:
        while True:
            first = self._q.get()
            group = [first]
            spill = []
            deadline = time.monotonic() + self.max_wait_s
            if self.clients is not None and self.clients <= 1:
                deadline = 0.0  # lone session: drain without waiting
            while len(group) < self.batch_size:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt["key"] == first["key"]:
                    group.append(nxt)
                else:
                    spill.append(nxt)
            for it in spill:  # different options: next round
                self._q.put(it)
            try:
                self._run_group(group)
            except Exception as e:  # pragma: no cover - surfaced to callers
                for it in group:
                    it["err"] = e
                    it["done"].set()

    def _run_group(self, group) -> None:
        t = self.t
        (P, strategy, beam_size, max_depth, padding, sup_len, kv_quant,
         self_quant, max_ts_idx, _prompt_ids) = group[0]["key"]
        fn = t._batch_window_fn(
            len(group[0]["window"]), P, strategy, beam_size, max_depth,
            padding, sup_len, kv_quant, self_quant, timestamps=True,
            max_initial_ts_idx=max_ts_idx,
        )
        # Pad to the smallest power of two >= the group, not to the full
        # batch_size: the jitted program specializes per batch shape (one
        # cached compile per rung), so partial demand -- a lone session, or
        # 5 of 8 sessions coalescing -- pays for its rung, not the full
        # batch. Meshed transcribers keep the fixed size (dp must divide).
        size = self.batch_size
        if getattr(t, "mesh", None) is None:
            size = 1
            while size < len(group):
                size *= 2
            size = min(size, self.batch_size)
        waves = np.stack([it["window"] for it in group])
        if len(group) < size:
            waves = np.concatenate(
                [waves,
                 np.repeat(waves[:1], size - len(group), axis=0)])
        toks, lengths = fn(
            t.params, t._place_batch(waves), group[0]["prompt"],
            group[0]["suppress"])
        toks, lengths = np.asarray(toks), np.asarray(lengths)
        self.batches += 1
        self.batched_requests += len(group)
        for j, it in enumerate(group):
            it["out"] = (toks[j], int(lengths[j]))
            it["done"].set()


class StreamingTranscriber:
    """Incremental transcription over a growing audio stream.

    Usage::

        st = StreamingTranscriber(params, cfg, tokenizer)
        for block in audio_blocks:          # float32 mono @ 16 kHz
            for seg in st.push(block):      # newly CONFIRMED segments
                print(seg.text)
        for seg in st.finish():             # flush the unstable tail
            print(seg.text)

    `confirmed` accumulates every confirmed segment (absolute stream
    times). Confirmation requires two consecutive decodes to agree on a
    segment's text AND the segment to end at least `confirm_margin_seconds`
    before the buffer's live edge (the tail is always unstable). When the
    buffer outgrows one window, segments that fall entirely before the
    forced trim point are confirmed from the best available hypothesis --
    they can never be re-decoded.
    """

    def __init__(
        self,
        params,
        cfg,
        tokenizer,
        options: Optional[DecodeOptions] = None,
        min_step_seconds: float = 1.0,
        confirm_margin_seconds: float = 0.3,
        transcriber: Optional[Transcriber] = None,
        batcher: Optional[StreamDecodeBatcher] = None,
    ):
        # A shared Transcriber lets many concurrent streams (e.g. server
        # sessions) reuse ONE compiled window executable; params/cfg/
        # tokenizer may then be None. A shared `batcher` additionally
        # merges concurrent sessions' decodes into one batched program
        # call (StreamDecodeBatcher).
        self._t = transcriber or Transcriber(params, cfg, tokenizer)
        self._batcher = batcher
        cfg, tokenizer = self._t.cfg, self._t.tok
        self.opt = dataclasses.replace(
            options or DecodeOptions(), timestamps=True
        )
        self.min_step_seconds = float(min_step_seconds)
        self.confirm_margin_seconds = float(confirm_margin_seconds)
        self._n_window = max_waveform_samples(
            cfg.encoder_ctx_size - self.opt.padding
        )
        self._prompt, self._n_cond = self._t._build_prompt(self.opt)
        self._buffer = np.zeros(0, np.float32)
        self._offset = 0.0  # stream time (s) of buffer[0]
        self._pending = 0  # samples accumulated since the last decode
        self._prev: List[Segment] = []  # last hypothesis (unconfirmed zone)
        self.confirmed: List[Segment] = []

    # ------------------------------------------------------------------
    @property
    def text(self) -> str:
        """All confirmed text so far."""
        return " ".join(s.text.strip() for s in self.confirmed)

    def push(self, samples, sample_rate: int = SAMPLE_RATE) -> List[Segment]:
        """Append audio; returns segments that just became confirmed.

        Decodes only once at least `min_step_seconds` of new audio has
        accumulated (cheaper cadence control belongs to the caller: push
        small blocks freely, decoding happens on the configured step).
        """
        if sample_rate != SAMPLE_RATE:
            raise ValueError(
                f"streaming expects {SAMPLE_RATE} Hz audio, got {sample_rate}"
            )
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, samples])
        self._pending += len(samples)
        if self._pending < int(self.min_step_seconds * SAMPLE_RATE):
            return []
        self._pending = 0
        return self._step()

    def finish(self) -> List[Segment]:
        """Decode whatever remains and confirm all of it.

        The buffer may hold more than one window of audio (pushes smaller
        than `min_step_seconds` accumulate without decoding): drain full
        windows first so no trailing audio is silently dropped.
        """
        tail: List[Segment] = []
        while len(self._buffer) > self._n_window:
            # vad: a silent backlogged window must not dispatch a decode
            # (and possibly confirm hallucinated text) any more than a
            # silent final buffer does -- check the window slice first.
            if self.opt.vad and vad.is_silent(
                self._buffer[: self._n_window], SAMPLE_RATE,
                self.opt.vad_threshold_db, self.opt.vad_min_speech_seconds,
            ):
                self._trim_to(self._offset + self._n_window / SAMPLE_RATE)
                self._prev = []
                continue
            # first window's worth is final: gated like any confirmation
            tail.extend(s for s in self._decode() if self._confirm_ok(s))
            self._trim_to(self._offset + self._n_window / SAMPLE_RATE)
            self._prev = []
        if len(self._buffer) < 400:  # < n_fft: no decodable audio left
            tail.extend(s for s in self._prev if self._confirm_ok(s))
        elif self._skip_silence():
            pass  # vad: a silent final buffer has nothing to flush
        else:
            tail.extend(s for s in self._decode() if self._confirm_ok(s))
        self.confirmed.extend(tail)
        self._buffer = np.zeros(0, np.float32)
        self._prev = []
        self._pending = 0
        return tail

    # ------------------------------------------------------------------
    def _confirm_ok(self, seg: Segment) -> bool:
        """Quality gate on permanent confirmation: confirmed text can never
        be retracted, so a segment whose text trips the compression-ratio
        repetition check (DecodeOptions.compression_ratio_threshold) is
        DROPPED instead of confirmed -- a hallucination loop in a live
        session must not enter the immutable transcript. Streaming decodes
        at temps[0] (re-decoding at higher temperatures would break the
        local-agreement stability contract), so this gate is the streaming
        arm of the robust-decoding ladder."""
        thr = self.opt.compression_ratio_threshold
        if thr is not None and compression_ratio(seg.text) > thr:
            log.warning(
                "dropping low-quality segment [%.2f-%.2f] at confirmation "
                "(compression ratio %.2f > %.2f): %r",
                seg.start, seg.end, compression_ratio(seg.text), thr,
                seg.text[:80],
            )
            return False
        return True

    # ------------------------------------------------------------------
    def _decode(self) -> List[Segment]:
        """One fixed-shape window decode of the current buffer."""
        real = min(len(self._buffer), self._n_window)
        window = np.zeros(self._n_window, np.float32)
        window[:real] = self._buffer[:real]
        P = int(self._prompt.shape[0])
        max_ts_idx = max(
            0, int(round(self.opt.max_initial_timestamp / 0.02)))
        sup_len = self.opt.suppress_until_len + self._n_cond
        if self._batcher is not None:
            # batched == single tokens: the batched window program uses the
            # per-sample mel max and the flat-batched decode, both pinned
            # token-identical to the singleton program by tests
            key = (P, self.opt.strategy, self.opt.beam_size,
                   self.opt.max_depth, self.opt.padding, sup_len,
                   self.opt.kv_quant, self.opt.self_quant, max_ts_idx,
                   tuple(int(t) for t in np.asarray(self._prompt)))
            row, length = self._batcher.decode(
                window, self._prompt, self._t._suppress_ts, key)
            tokens = [int(t) for t in row[:length]]
        else:
            fn = self._t._window_fn(
                self._n_window, P, self.opt.strategy,
                self.opt.beam_size, self.opt.max_depth, self.opt.padding,
                sup_len, self.opt.kv_quant,
                self.opt.self_quant, timestamps=True,
                max_initial_ts_idx=max_ts_idx,
            )
            toks_dev, length = fn(
                self._t.params, jnp.asarray(window), self._prompt,
                self._t._suppress_ts,
            )
            tokens = [int(t) for t in np.asarray(toks_dev)[: int(length)]]
        tokens = tokens[self._n_cond :]  # drop the conditioning prefix
        real_s = real / SAMPLE_RATE
        segs = segments_from_tokens(
            tokens, self._t.tok, offset_s=self._offset, window_s=real_s
        )
        # Segments inside the zero padding are artifacts; clamp ends to the
        # live audio.
        out = []
        for s in segs:
            if s.start - self._offset >= real_s:
                continue
            out.append(
                Segment(s.start, min(s.end, self._offset + real_s), s.text,
                        s.tokens)
            )
        return out

    def _trim_to(self, cut_time: float) -> None:
        """Drop buffer audio before `cut_time` (absolute stream seconds)."""
        cut = int(round((cut_time - self._offset) * SAMPLE_RATE))
        cut = max(0, min(cut, len(self._buffer)))
        self._buffer = self._buffer[cut:]
        self._offset += cut / SAMPLE_RATE

    def _skip_silence(self) -> bool:
        """Energy-VAD for live sessions (DecodeOptions.vad): when there is
        no unstable hypothesis and the whole buffer is silent, skip the
        decode entirely and drop the dead air, keeping a tail (>= 0.5 s and
        >= the VAD speech-duration floor) so a word starting at the live
        edge is never cut. Long silent stretches then cost zero chip time
        instead of one decode per step."""
        if not self.opt.vad or self._prev:
            return False
        if not vad.is_silent(self._buffer, SAMPLE_RATE,
                             self.opt.vad_threshold_db,
                             self.opt.vad_min_speech_seconds):
            return False
        # The kept tail must cover vad_min_speech_seconds: a speech onset
        # shorter than the floor is (by definition) classified silent, so a
        # tail shorter than the floor could trim a real onset permanently.
        keep = max(
            SAMPLE_RATE // 2,
            int(self.opt.vad_min_speech_seconds * SAMPLE_RATE) + HOP_LENGTH,
        )
        if len(self._buffer) > keep:
            self._trim_to(
                self._offset + (len(self._buffer) - keep) / SAMPLE_RATE)
        return True

    def _step(self) -> List[Segment]:
        if self._skip_silence():
            return []
        newly: List[Segment] = []

        # Forced trim: the window is full, so audio beyond one window can
        # never be decoded again -- confirm the previous hypothesis up to
        # the cut point and drop that audio.
        over = len(self._buffer) - self._n_window
        if over > 0:
            cut_time = self._offset + over / SAMPLE_RATE
            while self._prev and self._prev[0].end <= cut_time:
                seg = self._prev.pop(0)
                if self._confirm_ok(seg):  # repetition loops never confirm
                    newly.append(seg)
            self.confirmed.extend(newly)
            self._trim_to(cut_time)

        segs = self._decode()

        # LocalAgreement-2: confirm the leading segments whose text matches
        # the previous hypothesis and which end clear of the live edge.
        live_edge = self._offset + len(self._buffer) / SAMPLE_RATE
        margin_t = live_edge - self.confirm_margin_seconds
        n = 0
        for a, b in zip(self._prev, segs):
            if a.text.strip() == b.text.strip() and b.end <= margin_t:
                n += 1
            else:
                break
        if n:
            # a stable repetition loop agrees with itself: gate agreement-
            # based confirmation too (the trim still advances past the
            # agreed span so the loop audio is not re-decoded forever)
            agreed = [s for s in segs[:n] if self._confirm_ok(s)]
            self.confirmed.extend(agreed)
            newly.extend(agreed)
            self._trim_to(segs[n - 1].end)
        self._prev = segs[n:]
        return newly
