"""Full-pipeline independent-oracle parity gate (VERDICT r2 next-round #1).

The strongest offline stand-in for the env-blocked golden E2E: the ENTIRE
jitted pipeline (waveform -> windows -> mel -> encoder -> beam/greedy ->
stitch -> text, pipeline/transcribe.py) is run against tests/host_oracle.py --
a pure-NumPy float64 implementation of the reference's complete semantics
(src/transcribe.rs:23-383) that shares no compute code with whisper_tpu --
on multi-window synthetic audio, asserting TOKEN-EXACT equality end to end.

The repo side runs under matmul_precision="highest" (the parity mode the real
golden gate uses); the oracle is f64, so agreement here means every
composition detail (window bounds, 10-frame pad, prompt, suppression window,
beam scoring/freezing/tie-breaks, stitch splicing, chunk-text accumulation)
lines up, not just each stage in isolation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import host_oracle
from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as M
from whisper_tpu.ops.audio import max_waveform_samples, prep_audio
from whisper_tpu.pipeline.transcribe import DecodeOptions, Transcriber
from whisper_tpu.text.tokenizer import (
    WhisperTokenizer,
    build_test_tokenizer_json,
)

ENC_CTX = 96  # window = 160*(86+1)-1 = 13919 samples (~0.87 s at 16 kHz)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tok_path = str(tmp_path_factory.mktemp("gold") / "tokenizer.json")
    build_test_tokenizer_json(tok_path)
    tok = WhisperTokenizer(tok_path)
    cfg = tiny_test_config(
        n_state=32, n_head=2, n_layer=2, n_vocab=tok.vocab_size,
        n_audio_ctx=ENC_CTX, n_text_ctx=48,
    )
    params = M.init_params(jax.random.PRNGKey(7), cfg)
    return params, cfg, tok


def _audio(n_samples: int, seed: int) -> np.ndarray:
    """Speech-shaped-ish synthetic audio: tones + amplitude bursts + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / 16000.0
    x = (
        0.3 * np.sin(2 * np.pi * 220.0 * t)
        + 0.2 * np.sin(2 * np.pi * 880.0 * t * (1 + 0.3 * np.sin(2 * np.pi * 2.0 * t)))
        + 0.1 * rng.standard_normal(n_samples)
    )
    envelope = 0.5 + 0.5 * np.sign(np.sin(2 * np.pi * 1.3 * t))
    return (x * envelope).astype(np.float32)


def _run_repo(params, cfg, tok, wave, strategy, beam_size, max_depth, overlap_s):
    t = Transcriber(params, cfg, tok, attention="xla",
                    matmul_precision="highest")
    chunks = []
    text, tokens = t.transcribe(
        wave,
        options=DecodeOptions(
            lang="en", strategy=strategy, beam_size=beam_size,
            max_depth=max_depth, chunk_overlap_seconds=overlap_s,
        ),
        on_chunk=lambda i, s: chunks.append(s),
    )
    return text, tokens, chunks


class TestGoldenOracle:
    OVERLAP_S = 0.15  # < window so no clamp; still exercises window overlap

    def test_multiwindow_beam_token_exact(self, setup):
        """Beam=3 over 3 windows: the full pipelines agree token-for-token."""
        params, cfg, tok = setup
        n_window = max_waveform_samples(ENC_CTX - 10)
        shift = n_window - int(16000 * self.OVERLAP_S)
        wave = _audio(2 * shift + 7000, seed=3)  # 3 windows, last partial

        text, tokens, chunks = _run_repo(
            params, cfg, tok, wave, "beam", 3, 12, self.OVERLAP_S
        )
        otext, otokens, ochunks = host_oracle.oracle_waveform_to_text(
            params, cfg, tok, "en", wave,
            strategy="beam", beam_size=3, max_depth=12,
            chunk_overlap_seconds=self.OVERLAP_S,
        )
        assert len(chunks) == len(ochunks) == 3
        assert tokens == otokens
        assert text == otext
        assert chunks == ochunks
        # sanity: the gate is not vacuous -- windows decoded real tokens
        assert len(tokens) > len(tok.prompt_ids("en"))

    def test_multiwindow_greedy_token_exact(self, setup):
        """Greedy over 2 windows: stepwise-argmax pipelines agree exactly."""
        params, cfg, tok = setup
        n_window = max_waveform_samples(ENC_CTX - 10)
        shift = n_window - int(16000 * self.OVERLAP_S)
        wave = _audio(shift + 9000, seed=11)  # 2 windows

        text, tokens, chunks = _run_repo(
            params, cfg, tok, wave, "greedy", 1, 12, self.OVERLAP_S
        )
        otext, otokens, ochunks = host_oracle.oracle_waveform_to_text(
            params, cfg, tok, "en", wave,
            strategy="greedy", max_depth=12,
            chunk_overlap_seconds=self.OVERLAP_S,
        )
        assert len(chunks) == len(ochunks) == 2
        assert tokens == otokens
        assert text == otext
        assert chunks == ochunks


class TestTimestampRulesOracle:
    """Independent oracle for the timestamp logit constraints (VERDICT r4
    item 5): decode/beam.apply_timestamp_rules (batched, in-graph, f32) vs
    tests/host_oracle.oracle_timestamp_rules (sequential, per-sequence,
    f64) — randomized rule-level parity plus token-exact timestamped
    window decodes through the full pipelines."""

    def test_randomized_rule_parity(self):
        """200 random (logits, history) cases: identical mask pattern,
        untouched entries pass through bit-exact."""
        from whisper_tpu.decode.beam import apply_timestamp_rules

        V, eot, tsb, P, ctx = 24, 5, 14, 3, 16
        rng = np.random.default_rng(0)
        for _ in range(200):
            seq_len = int(rng.integers(P, ctx - 1))
            toks = rng.integers(0, V, size=(ctx,)).astype(np.int32)
            logits = (rng.standard_normal(V) * 3).astype(np.float32)
            got = np.asarray(
                apply_timestamp_rules(
                    jnp.asarray(logits)[None, :],
                    jnp.asarray(toks)[None, :],
                    jnp.int32(seq_len), P, tsb, eot, 6,
                )
            )[0]
            want = host_oracle.oracle_timestamp_rules(
                logits.astype(np.float64), toks[:seq_len], P, tsb, eot, 6
            )
            np.testing.assert_array_equal(
                np.isneginf(got), np.isneginf(want),
                err_msg=f"history={toks[:seq_len]}",
            )
            fin = ~np.isneginf(want)
            np.testing.assert_array_equal(got[fin], logits[fin])

    @pytest.mark.parametrize("strategy", ["greedy", "beam"])
    def test_timestamped_window_token_exact(self, setup, strategy):
        """A full timestamped window decode (frontend -> encoder -> rules ->
        greedy/beam) agrees token-for-token with the f64 oracle pipeline."""
        params, cfg, tok = setup
        from whisper_tpu.decode import beam as dbeam
        from whisper_tpu.decode import greedy as dgreedy

        tsb = tok.timestamp_begin
        prompt = tok.prompt_ids("en", timestamps=True)
        sup = np.asarray(tok.suppress_mask()).copy()
        sup[tsb:] = 0.0  # timestamps stay emittable (transcribe.py:311-318)
        padding, depth, max_ts_idx = 10, 12, 3
        wave = _audio(max_waveform_samples(ENC_CTX - padding), seed=29)

        with jax.default_matmul_precision("highest"):
            mel = prep_audio(jnp.asarray(wave)[None, :])
            keep = min(mel.shape[2], ENC_CTX - padding)
            mel = jnp.pad(mel[:, :, :keep], ((0, 0), (0, 0), (0, padding)))
            enc = M.encoder_forward(params, mel, cfg)
            pr = jnp.asarray(prompt, jnp.int32)
            if strategy == "beam":
                toks, length, _ = dbeam.beam_search(
                    params, enc, pr, cfg, eot_id=tok.eot,
                    suppress_mask=jnp.asarray(sup), beam_size=3,
                    max_depth=depth, ts_begin=tsb,
                    max_initial_ts_idx=max_ts_idx,
                )
                got = [int(t) for t in np.asarray(toks)[: int(length)]]
            else:
                toks, lengths, _ = dgreedy.greedy_decode(
                    params, enc, pr, cfg, eot_id=tok.eot,
                    suppress_mask=jnp.asarray(sup), max_depth=depth,
                    ts_begin=tsb, max_initial_ts_idx=max_ts_idx,
                )
                got = [int(t) for t in np.asarray(toks)[0][: int(lengths[0])]]

        model = host_oracle.OracleWhisper(params, cfg)
        omel = host_oracle.oracle_prep_audio(
            wave, cfg.audio_encoder_config.n_mels)
        want = host_oracle.oracle_window_tokens(
            model, omel, list(prompt), tok.eot, sup.astype(np.float64),
            strategy, 3, depth, padding, suppress_until_len=5,
            ts_begin=tsb, max_initial_ts_idx=max_ts_idx,
        )
        assert got == want
        # the gate is not vacuous: a timestamp token was actually emitted
        assert any(t >= tsb for t in got[len(prompt):])


class TestWordTimingOracle:
    """Independent f64 oracle for the word-timing aligner (VERDICT r4 item
    5): align.find_word_timings (jitted weight collection + trace-array
    DTW) vs host_oracle.oracle_word_timings (f64 loops + argmin-backtrack
    DTW + loop median filter) — exact words, tokens, and frame-grid
    times."""

    def test_word_timings_match_oracle(self, setup):
        from whisper_tpu.align import find_word_timings

        params, cfg, tok = setup
        rng = np.random.default_rng(41)
        sa = ENC_CTX // 2
        enc = rng.standard_normal((1, sa, 32)).astype(np.float32)
        # a plausible window sequence: prompt + text bytes + EOT
        text_ids = [int(t) for t in tok.encode(" hello world, ok")]
        seq = tok.prompt_ids("en", timestamps=False) + text_ids + [tok.eot]
        heads = [(1, 0), (1, 1)]  # top-half heads of the 2-layer decoder
        num_frames = sa - 4

        with jax.default_matmul_precision("highest"):
            got = find_word_timings(
                params, jnp.asarray(enc), seq, cfg, tok, num_frames,
                heads=heads,
            )

        model = host_oracle.OracleWhisper(params, cfg)
        want = host_oracle.oracle_word_timings(
            model, seq, np.asarray(enc, np.float64)[0], tok, num_frames,
            heads,
        )
        assert [w.word for w in got] == [w for w, *_ in want]
        assert [w.tokens for w in got] == [t for *_, t in want]
        got_times = [(w.start, w.end) for w in got]
        want_times = [(s, e) for _, s, e, _ in want]
        assert got_times == want_times
        assert len(got) >= 3  # "hello", "world,", "ok" (comma merged)


class TestOracleFrontendAgreement:
    """The two frontends (GEMM-DFT f32-highest vs rfft f64) agree numerically;
    a loud failure here localizes a golden-gate failure to the frontend."""

    def test_prep_audio_close(self, setup):
        _, cfg, _ = setup
        wave = _audio(5000, seed=5)
        ours = np.asarray(prep_audio(jnp.asarray(wave)[None, :]))[0]
        oracle = host_oracle.oracle_prep_audio(wave, cfg.audio_encoder_config.n_mels)
        assert ours.shape == oracle.shape
        np.testing.assert_allclose(ours, oracle, atol=2e-4)
