"""Speculative greedy decoding parity (decode/speculative.py).

The guarantee under test: at temperature 0 the speculative decoder emits
the SAME tokens, lengths, and (numerically) sum_logp as the plain greedy
while_loop, for any draft model -- the draft only changes how fast tokens
are accepted, never which tokens come out. Two draft regimes bracket the
acceptance range:

  * draft == target: every proposal matches, so every iteration takes the
    full-acceptance fast path (n_emit == n_draft, EOT/max-len truncation
    aside);
  * an independently-initialized draft: proposals are near-random, so most
    iterations accept nothing and exercise the bonus-token-only path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as M
from whisper_tpu.decode import greedy as dgreedy
from whisper_tpu.decode import speculative as dspec

CFG = tiny_test_config(n_vocab=32, n_text_ctx=48, n_audio_ctx=16)
DRAFT_CFG = tiny_test_config(
    n_vocab=32, n_text_ctx=48, n_audio_ctx=16, n_layer=1)
EOT = 7
SUPPRESS = [5, 6, 7, 30, 31]
PROMPT = jnp.asarray([1, 2, 3], jnp.int32)


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(3), CFG)


@pytest.fixture(scope="module")
def draft_params():
    return M.init_params(jax.random.PRNGKey(11), DRAFT_CFG)


def _enc(params, cfg, seed=7):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal(
        (1, 80, cfg.audio_encoder_config.n_audio_ctx)).astype(np.float32)
    return M.encoder_forward(params, jnp.asarray(mel), cfg)


@pytest.fixture(scope="module")
def enc_out(params):
    return _enc(params, CFG)


@pytest.fixture(scope="module")
def draft_enc_out(draft_params):
    return _enc(draft_params, DRAFT_CFG)


def _suppress_mask(ids=SUPPRESS):
    m = np.zeros((CFG.text_decoder_config.n_vocab,), np.float32)
    m[list(ids)] = -np.inf
    return jnp.asarray(m)


def _greedy(params, enc_out, **kw):
    return dgreedy.greedy_decode(
        params, enc_out, PROMPT, CFG, eot_id=EOT,
        suppress_mask=_suppress_mask(), **kw)


def _spec(params, enc_out, draft_params, draft_enc_out, **kw):
    kw.setdefault("draft_cfg", DRAFT_CFG)
    return dspec.speculative_greedy_decode(
        params, enc_out, PROMPT, CFG, eot_id=EOT,
        draft_params=draft_params, draft_enc_out=draft_enc_out,
        suppress_mask=_suppress_mask(), **kw)


def _assert_parity(g, s):
    np.testing.assert_array_equal(np.asarray(g[0]), np.asarray(s[0]))
    np.testing.assert_array_equal(np.asarray(g[1]), np.asarray(s[1]))
    np.testing.assert_allclose(
        np.asarray(g[2]), np.asarray(s[2]), rtol=2e-5, atol=1e-5)


class TestParity:
    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_random_draft(self, params, enc_out, draft_params,
                          draft_enc_out, k):
        """Near-zero acceptance: most blocks emit the bonus token only."""
        g = _greedy(params, enc_out, max_depth=16)
        s = _spec(params, enc_out, draft_params, draft_enc_out,
                  n_draft=k, max_depth=16)
        _assert_parity(g, s)

    @pytest.mark.parametrize("k", [2, 4, 8])
    def test_self_draft_full_accept(self, params, enc_out, k):
        """draft == target: every proposal verifies, so blocks emit
        n_draft tokens at a time -- the fast path of the accept logic."""
        g = _greedy(params, enc_out, max_depth=16)
        s = _spec(params, enc_out, params, enc_out, draft_cfg=CFG,
                  n_draft=k, max_depth=16)
        _assert_parity(g, s)

    def test_depth_budget_clamp(self, params, enc_out, draft_params,
                                draft_enc_out):
        """max_depth not a multiple of the block size: the final block is
        clamped so exactly max_depth tokens are emitted, like greedy."""
        for depth in (1, 2, 5):
            g = _greedy(params, enc_out, max_depth=depth)
            s = _spec(params, enc_out, params, enc_out, draft_cfg=CFG,
                      n_draft=4, max_depth=depth)
            _assert_parity(g, s)
            assert int(s[1][0]) == PROMPT.shape[0] + depth  # no EOT: full

    def test_eot_mid_block(self, params, enc_out):
        """A hook forces EOT part-way through an accepted block: emission
        must truncate at the EOT exactly where plain greedy stops."""
        V = CFG.text_decoder_config.n_vocab
        P = PROMPT.shape[0]

        def hook(x, tokens, seq_len):
            force = seq_len >= P + 6  # EOT becomes argmax from here on
            boost = jnp.where(jnp.arange(V)[None, :] == EOT, 1e4, 0.0)
            return jnp.where(force, x + boost, x)

        g = _greedy(params, enc_out, max_depth=16, logits_hook=hook)
        s = _spec(params, enc_out, params, enc_out, draft_cfg=CFG,
                  n_draft=4, max_depth=16, logits_hook=hook)
        _assert_parity(g, s)
        assert int(s[0][0, int(s[1][0]) - 1]) == EOT
        assert int(s[1][0]) < P + 16  # actually stopped early

    def test_timestamp_rules(self, params, enc_out, draft_params,
                             draft_enc_out):
        """In-graph timestamp constraints ride the shared logp fn."""
        m = np.zeros((CFG.text_decoder_config.n_vocab,), np.float32)
        m[[5, 6, 7]] = -np.inf  # keep timestamp ids (>= 20) emittable
        kw = dict(suppress_mask=jnp.asarray(m), max_depth=12,
                  ts_begin=20, max_initial_ts_idx=5)
        g = dgreedy.greedy_decode(
            params, enc_out, PROMPT, CFG, eot_id=EOT, **kw)
        s = dspec.speculative_greedy_decode(
            params, enc_out, PROMPT, CFG, eot_id=EOT,
            draft_params=draft_params, draft_enc_out=draft_enc_out,
            draft_cfg=DRAFT_CFG, n_draft=4, **kw)
        _assert_parity(g, s)
        first = int(s[0][0, PROMPT.shape[0]])
        assert first >= 20  # rule 3: first sampled token is a timestamp

    def test_nospeech_prob(self, params, enc_out, draft_params,
                           draft_enc_out):
        g = _greedy(params, enc_out, max_depth=8, nospeech_id=3, sot_pos=0)
        s = _spec(params, enc_out, draft_params, draft_enc_out,
                  n_draft=3, max_depth=8, nospeech_id=3, sot_pos=0)
        _assert_parity(g, s)
        np.testing.assert_allclose(
            np.asarray(g[3]), np.asarray(s[3]), rtol=1e-6)

    def test_quantized_target_caches(self, params, enc_out, draft_params,
                                     draft_enc_out):
        """kv/self-quant target caches: parity against greedy with the
        same quantization (the draft stays unquantized by design)."""
        g = _greedy(params, enc_out, max_depth=10, kv_quant=True,
                    self_quant=True)
        s = _spec(params, enc_out, draft_params, draft_enc_out,
                  n_draft=4, max_depth=10, kv_quant=True, self_quant=True)
        _assert_parity(g, s)

    def test_jit_and_donated_reuse(self, params, enc_out, draft_params,
                                   draft_enc_out):
        """The whole decode jits as one program and is re-entrant."""
        fn = jax.jit(lambda p, e, dp, de: dspec.speculative_greedy_decode(
            p, e, PROMPT, CFG, eot_id=EOT, draft_params=dp,
            draft_enc_out=de, draft_cfg=DRAFT_CFG,
            suppress_mask=_suppress_mask(), n_draft=4, max_depth=12))
        a = fn(params, enc_out, draft_params, draft_enc_out)
        b = fn(params, enc_out, draft_params, draft_enc_out)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        g = _greedy(params, enc_out, max_depth=12)
        _assert_parity(g, a)


class TestValidation:
    def test_batched_rejected(self, params, enc_out, draft_params,
                              draft_enc_out):
        enc2 = jnp.concatenate([enc_out, enc_out], axis=0)
        with pytest.raises(ValueError, match="B=1"):
            _spec(params, enc2, draft_params, draft_enc_out, n_draft=4)

    def test_vocab_mismatch_rejected(self, params, enc_out):
        bad_cfg = tiny_test_config(n_vocab=16, n_text_ctx=48, n_audio_ctx=16)
        bad = M.init_params(jax.random.PRNGKey(0), bad_cfg)
        with pytest.raises(ValueError, match="vocab"):
            _spec(params, enc_out, bad, _enc(bad, bad_cfg),
                  draft_cfg=bad_cfg, n_draft=4)

    def test_context_overflow_rejected(self, params, enc_out, draft_params,
                                       draft_enc_out):
        with pytest.raises(ValueError, match="fit in the decoder context"):
            _spec(params, enc_out, draft_params, draft_enc_out,
                  n_draft=8, max_depth=48)

    def test_bad_n_draft(self, params, enc_out, draft_params,
                         draft_enc_out):
        with pytest.raises(ValueError, match="n_draft"):
            _spec(params, enc_out, draft_params, draft_enc_out, n_draft=0)


class TestTranscriberIntegration:
    """Transcriber(draft=...) routes greedy temperature-0 windows through
    the speculative decoder; output must match the draftless pipeline."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        from whisper_tpu.text.tokenizer import (
            WhisperTokenizer, build_test_tokenizer_json)

        d = tmp_path_factory.mktemp("spec_pipe")
        tok_path = str(d / "tokenizer.json")
        build_test_tokenizer_json(tok_path)
        tok = WhisperTokenizer(tok_path)
        cfg = tiny_test_config(
            n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32, n_state=8)
        dcfg = tiny_test_config(
            n_vocab=tok.vocab_size, n_audio_ctx=64, n_text_ctx=32,
            n_state=8, n_layer=1)
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        dparams = M.init_params(jax.random.PRNGKey(9), dcfg)
        return params, cfg, dparams, dcfg, tok

    def test_transcribe_matches_draftless(self, setup):
        from whisper_tpu.pipeline.transcribe import (
            DecodeOptions, Transcriber)

        params, cfg, dparams, dcfg, tok = setup
        wave = np.random.default_rng(2).standard_normal(9000).astype(
            np.float32)
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=6,
                            chunk_overlap_seconds=0.02)
        plain = Transcriber(params, cfg, tok).transcribe(wave, 16000, opt)
        spec = Transcriber(
            params, cfg, tok, draft=(dparams, dcfg), draft_k=3,
        ).transcribe(wave, 16000, opt)
        assert plain[0] == spec[0]
        assert plain[1] == spec[1]

    def test_beam_ignores_draft(self, setup):
        from whisper_tpu.pipeline.transcribe import (
            DecodeOptions, Transcriber)

        params, cfg, dparams, dcfg, tok = setup
        wave = np.random.default_rng(3).standard_normal(5000).astype(
            np.float32)
        opt = DecodeOptions(lang="en", beam_size=2, max_depth=5,
                            chunk_overlap_seconds=0.01)
        plain = Transcriber(params, cfg, tok).transcribe(wave, 16000, opt)
        spec = Transcriber(
            params, cfg, tok, draft=(dparams, dcfg),
        ).transcribe(wave, 16000, opt)
        assert plain == spec

    def test_oversized_prompt_falls_back(self, setup):
        """prompt + depth + k past the context: the window program silently
        uses the plain greedy loop instead of erroring."""
        from whisper_tpu.pipeline.transcribe import (
            DecodeOptions, Transcriber)

        params, cfg, dparams, dcfg, tok = setup
        wave = np.random.default_rng(4).standard_normal(5000).astype(
            np.float32)
        opt = DecodeOptions(lang="en", strategy="greedy", max_depth=26,
                            chunk_overlap_seconds=0.01)  # 4+26+k > 32
        plain = Transcriber(params, cfg, tok).transcribe(wave, 16000, opt)
        spec = Transcriber(
            params, cfg, tok, draft=(dparams, dcfg), draft_k=4,
        ).transcribe(wave, 16000, opt)
        assert plain == spec

    def test_validation(self, setup):
        from whisper_tpu.pipeline.transcribe import Transcriber

        params, cfg, dparams, dcfg, tok = setup
        bad_cfg = tiny_test_config(n_vocab=16, n_text_ctx=32, n_audio_ctx=64)
        bad = M.init_params(jax.random.PRNGKey(1), bad_cfg)
        with pytest.raises(ValueError, match="vocab"):
            Transcriber(params, cfg, tok, draft=(bad, bad_cfg))
        import dataclasses as _dc

        mel_cfg = _dc.replace(
            dcfg, audio_encoder_config=_dc.replace(
                dcfg.audio_encoder_config, n_mels=128))
        with pytest.raises(ValueError, match="n_mels"):
            Transcriber(params, cfg, tok, draft=(dparams, mel_cfg))
        with pytest.raises(ValueError, match="draft_k"):
            Transcriber(params, cfg, tok, draft=(dparams, dcfg), draft_k=0)


class TestDraftHook:
    def test_hostile_draft_hook_cannot_change_output(
            self, params, enc_out, draft_params, draft_enc_out):
        """draft_logits_hook biases only the PROPOSALS; a hook that forces
        garbage proposals costs speed, never correctness."""
        V = CFG.text_decoder_config.n_vocab

        def garbage(x, tokens, seq_len):
            tok = (seq_len * 13 + 1) % V  # arbitrary forced proposal
            return jnp.where(jnp.arange(V)[None, :] == tok, 1e4, -1e4)

        g = _greedy(params, enc_out, max_depth=12)
        s = _spec(params, enc_out, draft_params, draft_enc_out,
                  n_draft=4, max_depth=12, draft_logits_hook=garbage)
        _assert_parity(g, s)
