"""Word-level timestamp alignment (whisper_tpu/align.py): DTW, median
filter, word splitting, and the end-to-end per-window API. New capability
beyond the reference (plain-text only, src/transcribe.rs:309-312)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.align import (
    WordTiming,
    cross_attention_weights,
    default_alignment_heads,
    dtw,
    find_word_timings,
    median_filter,
    split_tokens_on_spaces,
)
from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as M
from whisper_tpu.pipeline.transcribe import Transcriber
from whisper_tpu.text.tokenizer import (
    WhisperTokenizer,
    build_test_tokenizer_json,
)


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aligntok") / "tokenizer.json")
    build_test_tokenizer_json(path)
    return WhisperTokenizer(path)


class TestDtw:
    def test_diagonal_identity(self):
        # a strongly diagonal cost matrix aligns i -> i
        n = 8
        cost = np.ones((n, n)) - 2 * np.eye(n)
        ti, tj = dtw(cost)
        on_diag = [j for i, j in zip(ti, tj) if i == j]
        assert len(on_diag) >= n  # path visits every diagonal cell
        assert ti[0] == 0 and tj[0] == 0
        assert ti[-1] == n - 1 and tj[-1] == n - 1

    def test_monotone(self):
        rng = np.random.default_rng(0)
        cost = rng.random((5, 12))
        ti, tj = dtw(cost)
        assert (np.diff(ti) >= 0).all() and (np.diff(tj) >= 0).all()
        assert (np.diff(ti) + np.diff(tj) >= 1).all()  # always advances


class TestMedianFilter:
    def test_constant_preserved(self):
        x = np.full((2, 3, 20), 5.0)
        assert np.array_equal(median_filter(x, 7), x)

    def test_spike_removed(self):
        x = np.zeros(15)
        x[7] = 100.0
        y = median_filter(x[None], 7)[0]
        assert y[7] == 0.0

    def test_width_one_identity(self):
        x = np.random.default_rng(0).random(9)
        assert np.array_equal(median_filter(x, 1), x)


class TestWordSplitting:
    def test_splits_on_spaces(self, tok):
        ids = tok.encode("hello world again")
        words = split_tokens_on_spaces(ids, tok)
        assert [w for w, _, _ in words] == ["hello", "world", "again"]
        # positions cover exactly the input (no specials here)
        flat = [p for _, _, ps in words for p in ps]
        assert flat == sorted(flat)
        assert len(flat) == len(ids)

    def test_specials_skipped(self, tok):
        ids = tok.prompt_ids("en") + tok.encode("hi there") + [tok.eot]
        words = split_tokens_on_spaces(ids, tok)
        assert [w for w, _, _ in words] == ["hi", "there"]
        # positions index into the FULL sequence (prompt offset included)
        assert min(p for _, _, ps in words for p in ps) >= 4


class TestMergePunctuations:
    def _w(self, word, start, end, tokens=()):
        from whisper_tpu.align import WordTiming

        return WordTiming(word, start, end, list(tokens))

    def test_append_merges_into_previous(self):
        from whisper_tpu.align import merge_punctuations

        out = merge_punctuations([
            self._w("Hello", 0.0, 0.4, [1]),
            self._w(",", 0.4, 0.45, [2]),
            self._w("world", 0.5, 0.9, [3]),
            self._w("!", 0.9, 0.95, [4]),
        ])
        assert [w.word for w in out] == ["Hello,", "world!"]
        assert out[0].start == 0.0 and out[0].end == 0.4  # keeps own timing
        assert out[0].tokens == [1, 2] and out[1].tokens == [3, 4]

    def test_prepend_merges_into_following(self):
        from whisper_tpu.align import merge_punctuations

        out = merge_punctuations([
            self._w("¿", 0.0, 0.05, [1]),
            self._w("(", 0.05, 0.1, [2]),
            self._w("Qué", 0.1, 0.5, [3]),
        ])
        assert [w.word for w in out] == ["¿(Qué"]
        assert out[0].start == 0.1 and out[0].tokens == [1, 2, 3]

    def test_plain_words_untouched(self):
        from whisper_tpu.align import merge_punctuations

        words = [self._w("a", 0, 1), self._w("b", 1, 2)]
        assert [w.word for w in merge_punctuations(words)] == ["a", "b"]

    def test_leading_append_and_trailing_prepend_stand_alone(self):
        from whisper_tpu.align import merge_punctuations

        out = merge_punctuations([self._w(",", 0, 1), self._w("-", 1, 2)])
        assert [w.word for w in out] == [",", "-"]


class TestAlignment:
    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("aligntok2") / "tokenizer.json")
        build_test_tokenizer_json(path)
        tok = WhisperTokenizer(path)
        cfg = tiny_test_config(
            n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=48, n_state=8,
        )
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        return params, cfg, tok

    def test_weights_shape_and_rows_sum(self, setup):
        params, cfg, tok = setup
        enc = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 64, 8)), jnp.float32)
        toks = jnp.asarray(tok.prompt_ids("en") + tok.encode("ab"), jnp.int32)
        ws = np.asarray(cross_attention_weights(params, enc, toks, cfg))
        L = cfg.text_decoder_config.n_text_layer
        H = cfg.text_decoder_config.n_text_head
        assert ws.shape == (L, H, toks.shape[0], 64)
        np.testing.assert_allclose(ws.sum(-1), 1.0, atol=1e-4)

    def test_default_heads(self, setup):
        _, cfg, _ = setup
        heads = default_alignment_heads(cfg)
        L = cfg.text_decoder_config.n_text_layer
        H = cfg.text_decoder_config.n_text_head
        assert len(heads) == (L - L // 2) * H
        assert all(l >= L // 2 for l, _ in heads)

    def test_find_word_timings_structure(self, setup):
        params, cfg, tok = setup
        enc = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 64, 8)), jnp.float32)
        seq = tok.prompt_ids("en") + tok.encode("one two three") + [tok.eot]
        words = find_word_timings(
            params, enc, seq, cfg, tok, num_frames=40)
        assert [w.word for w in words] == ["one", "two", "three"]
        # window-relative, monotone, non-negative, on the 20 ms grid
        last_end = 0.0
        for w in words:
            assert 0.0 <= w.start <= w.end
            assert w.start >= last_end - 1e-9
            last_end = w.start
            assert abs(w.start / 0.02 - round(w.start / 0.02)) < 1e-6

    def test_transcriber_align_words(self, setup):
        params, cfg, tok = setup
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(4000).astype(
            np.float32)
        seq = tok.prompt_ids("en") + tok.encode("alpha beta") + [tok.eot]
        words = t.align_words(wave, seq, offset_s=10.0)
        assert [w.word for w in words] == ["alpha", "beta"]
        assert all(w.start >= 10.0 for w in words)
        assert all(isinstance(w, WordTiming) for w in words)


class TestWordTimestampsPipeline:
    def test_segments_carry_words(self, tok):
        import jax.numpy as _  # noqa: F401 (jnp imported at module top)

        cfg = tiny_test_config(
            n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=48, n_state=8,
        )
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        t = Transcriber(params, cfg, tok)
        wave = np.random.default_rng(0).standard_normal(8000).astype(
            np.float32)
        from whisper_tpu.pipeline.transcribe import DecodeOptions

        text, segs = t.transcribe_with_timestamps(
            wave, 16000,
            DecodeOptions(strategy="greedy", max_depth=5,
                          chunk_overlap_seconds=0.01),
            word_timestamps=True,
        )
        for seg in segs:
            assert seg.words is not None
            joined = "".join(w.word for w in seg.words).replace(" ", "")
            assert joined == seg.text.replace(" ", "")
            for w in seg.words:
                assert w.start <= w.end
