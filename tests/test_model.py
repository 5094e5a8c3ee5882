"""Model forward parity tests vs an independent PyTorch oracle (SURVEY.md §4
item 1: "attention/block/encoder/decoder forward vs dumped activations" -- here
the oracle is a from-scratch torch implementation of the published architecture,
standing in for the Burn/tch reference which cannot run in this image).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as m

from torch_ref import TorchWhisper

CFG = tiny_test_config()


@pytest.fixture(scope="module")
def params():
    return m.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def np_params(params):
    return jax.tree.map(np.asarray, params)


def _mel(rng, batch=1, frames=None):
    frames = frames or CFG.audio_encoder_config.n_audio_ctx
    return rng.standard_normal((batch, CFG.audio_encoder_config.n_mels, frames)).astype(
        np.float32
    )


def _tokens(rng, batch=1, seq=8):
    return rng.integers(
        0, CFG.text_decoder_config.n_vocab, size=(batch, seq)
    ).astype(np.int32)


class TestForwardParity:
    def test_encoder(self, rng, params, np_params):
        mel = _mel(rng)
        ours = np.asarray(m.encoder_forward(params, jnp.asarray(mel), CFG))
        theirs = TorchWhisper(np_params, CFG).encode(mel).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=3e-4)

    def test_encoder_short_input_slices_pos_emb(self, rng, params, np_params):
        """Shorter-than-ctx audio works; pos emb sliced (src/model/mod.rs:246-252)."""
        mel = _mel(rng, frames=CFG.audio_encoder_config.n_audio_ctx - 10)
        ours = np.asarray(m.encoder_forward(params, jnp.asarray(mel), CFG))
        theirs = TorchWhisper(np_params, CFG).encode(mel).numpy()
        np.testing.assert_allclose(ours, theirs, atol=3e-4)

    def test_full_forward(self, rng, params, np_params):
        mel, toks = _mel(rng), _tokens(rng)
        ours = np.asarray(m.whisper_forward(params, jnp.asarray(mel), jnp.asarray(toks), CFG))
        theirs = TorchWhisper(np_params, CFG).forward(mel, toks)
        np.testing.assert_allclose(ours, theirs, atol=5e-4)

    def test_decoder_batch(self, rng, params, np_params):
        mel, toks = _mel(rng, batch=3), _tokens(rng, batch=3, seq=5)
        enc = m.encoder_forward(params, jnp.asarray(mel), CFG)
        ours = np.asarray(m.decoder_forward(params, jnp.asarray(toks), enc, CFG))
        tw = TorchWhisper(np_params, CFG)
        theirs = tw.decode(toks, tw.encode(mel)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=5e-4)

    def test_ctx_length_guards(self, rng, params):
        """Reference asserts (src/model/mod.rs:134-139, 231-241)."""
        with pytest.raises(ValueError):
            m.encoder_forward(
                params,
                jnp.zeros((1, CFG.audio_encoder_config.n_mels,
                           CFG.audio_encoder_config.n_audio_ctx + 1)),
                CFG,
            )
        with pytest.raises(ValueError):
            m.decoder_forward(
                params,
                jnp.zeros((1, CFG.text_decoder_config.n_text_ctx + 1), jnp.int32),
                jnp.zeros((1, 4, CFG.n_state)),
                CFG,
            )


class TestKVCache:
    """Incremental decode must equal full-sequence forward (causal masking)."""

    def test_prefill_matches_full(self, rng, params):
        mel, toks = _mel(rng), _tokens(rng, seq=6)
        enc = m.encoder_forward(params, jnp.asarray(mel), CFG)
        full = np.asarray(m.decoder_forward(params, jnp.asarray(toks), enc, CFG))

        cache = m.init_cache(params, enc, CFG)
        logits, cache = m.decoder_step(
            params, jnp.asarray(toks), jnp.int32(0), cache, CFG
        )
        np.testing.assert_allclose(np.asarray(logits), full, atol=3e-4)

    def test_stepwise_matches_full(self, rng, params):
        mel, toks = _mel(rng), _tokens(rng, seq=7)
        enc = m.encoder_forward(params, jnp.asarray(mel), CFG)
        full = np.asarray(m.decoder_forward(params, jnp.asarray(toks), enc, CFG))

        # prefill 3 tokens, then step one-by-one
        cache = m.init_cache(params, enc, CFG)
        logits, cache = m.decoder_step(
            params, jnp.asarray(toks[:, :3]), jnp.int32(0), cache, CFG
        )
        np.testing.assert_allclose(np.asarray(logits), full[:, :3], atol=3e-4)
        for i in range(3, 7):
            logits, cache = m.decoder_step(
                params, jnp.asarray(toks[:, i : i + 1]), jnp.int32(i), cache, CFG
            )
            np.testing.assert_allclose(
                np.asarray(logits)[:, 0], full[:, i], atol=1e-4
            )

    def test_cross_kv_broadcast(self, rng, params):
        """Beam-style cache: enc batch 1, decode batch 5."""
        mel = _mel(rng)
        toks = _tokens(rng, batch=5, seq=4)
        enc = m.encoder_forward(params, jnp.asarray(mel), CFG)
        cache = m.init_cache(params, enc, CFG, batch=5)
        logits, _ = m.decoder_step(params, jnp.asarray(toks), jnp.int32(0), cache, CFG)

        enc5 = jnp.broadcast_to(enc, (5,) + enc.shape[1:])
        full = np.asarray(m.decoder_forward(params, jnp.asarray(toks), enc5, CFG))
        np.testing.assert_allclose(np.asarray(logits), full, atol=3e-4)

    def test_reorder_cache(self, rng, params):
        mel = _mel(rng)
        enc = m.encoder_forward(params, jnp.asarray(mel), CFG)
        cache = m.init_cache(params, enc, CFG, batch=3)
        toks = _tokens(rng, batch=3, seq=2)
        _, cache = m.decoder_step(params, jnp.asarray(toks), jnp.int32(0), cache, CFG)
        perm = jnp.asarray([2, 0, 1])
        re = m.reorder_cache(cache, perm)
        np.testing.assert_allclose(
            np.asarray(re.self_k[0]), np.asarray(cache.self_k[2])
        )
        # cross KV untouched
        assert re.cross_k is cache.cross_k


class TestAsymmetricLayers:
    """large-v3-turbo shape: encoder and decoder layer counts DIFFER (32/4).
    No other test exercises distinct depths; this pins the stacked-scan
    param layout and both forward paths at a tiny asymmetric config."""

    def test_turbo_shaped_forward_and_decode(self):
        import dataclasses

        from whisper_tpu.config import (
            AudioEncoderConfig,
            TextDecoderConfig,
            WhisperConfig,
        )
        from whisper_tpu.decode.greedy import greedy_decode

        cfg = WhisperConfig(
            audio_encoder_config=AudioEncoderConfig(
                n_mels=80, n_audio_ctx=32, n_audio_state=16, n_audio_head=2,
                n_audio_layer=3),
            text_decoder_config=TextDecoderConfig(
                n_vocab=64, n_text_ctx=16, n_text_state=16, n_text_head=2,
                n_text_layer=2),
        )
        params = m.init_params(jax.random.PRNGKey(0), cfg)
        assert params["encoder"]["blocks"]["qkv_w"].shape[0] == 3
        assert params["decoder"]["blocks"]["qkv_w"].shape[0] == 2

        mel = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 80, 32)),
            jnp.float32)
        toks = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
        logits = m.whisper_forward(params, mel, toks, cfg)
        assert logits.shape == (2, 3, 64)
        assert np.isfinite(np.asarray(logits)).all()

        enc = m.encoder_forward(params, mel, cfg)
        t, l, _ = greedy_decode(
            params, enc, jnp.asarray([1, 2], jnp.int32), cfg, eot_id=0,
            max_depth=4)
        assert t.shape[0] == 2 and np.isfinite(np.asarray(l)).all()

        # the fused (flash) decode path at asymmetric depth, interpret mode
        fcfg = dataclasses.replace(cfg, attention="flash")
        tf, lf, _ = greedy_decode(
            params, enc, jnp.asarray([1, 2], jnp.int32), fcfg, eot_id=0,
            max_depth=4)
        assert np.array_equal(np.asarray(t), np.asarray(tf))


class TestKernelKnobs:
    """config.KernelKnobs (VERDICT r4 item 8): the WHISPER_TPU_* trace-time
    env reads are now WhisperConfig fields; env vars remain overrides."""

    def test_env_overrides_config(self, monkeypatch):
        from whisper_tpu.config import KernelKnobs, resolve_knobs

        base = KernelKnobs(int8_impl="w8a8", cow=False, dedup_reads=True)
        assert resolve_knobs(base) == base  # no env: config wins
        monkeypatch.setenv("WHISPER_TPU_INT8_IMPL", "pallas")
        monkeypatch.setenv("WHISPER_TPU_COW", "1")
        monkeypatch.setenv("WHISPER_TPU_DEDUP_READS", "0")
        monkeypatch.setenv("WHISPER_TPU_PREFIX_RUNGS", "2")
        r = resolve_knobs(base)
        assert (r.int8_impl, r.cow, r.dedup_reads, r.prefix_rungs) == (
            "pallas", True, False, 2)

    def test_knobs_not_serialized_to_cfg(self):
        import dataclasses as dc

        from whisper_tpu.config import KernelKnobs, WhisperConfig

        cfg = dc.replace(
            tiny_test_config(), knobs=KernelKnobs(encoder_mlp="xla"))
        d = cfg.to_cfg_dict()
        assert "knobs" not in d
        # round-trip comes back with defaults (reference .cfg parity)
        assert WhisperConfig.from_cfg_dict(d).knobs == KernelKnobs()

    def test_config_drives_paths_without_env(self):
        """The helpers that used to read os.environ now read the config."""
        import dataclasses as dc

        from whisper_tpu.config import KernelKnobs, active_knobs
        from whisper_tpu.decode.beam import _fuse_reshuffle, _use_cow
        from whisper_tpu.models.whisper import _use_fused_mlp
        from whisper_tpu.quantize import quantize_tensor

        qt = quantize_tensor(np.ones((8, 8), np.float32))
        fcfg = dc.replace(tiny_test_config(), attention="flash")
        assert _fuse_reshuffle(qt, fcfg) is True
        off = dc.replace(fcfg, knobs=KernelKnobs(fused_permute=False))
        assert _fuse_reshuffle(qt, off) is False
        assert _use_cow(True, fcfg) is True
        assert _use_cow(True, dc.replace(
            fcfg, knobs=KernelKnobs(cow=False))) is False
        with active_knobs(KernelKnobs(encoder_mlp="xla")):
            assert _use_fused_mlp(np.ones((128, 512)), "flash") is False

    def test_knobbed_beam_token_equal(self, params):
        """fused_permute=False via CONFIG (no env) decodes the same tokens
        as the default fused path."""
        import dataclasses as dc

        from whisper_tpu.config import KernelKnobs
        from whisper_tpu.decode.beam import beam_search_batched

        rng = np.random.default_rng(5)
        mel = rng.standard_normal((2, 80, CFG.audio_encoder_config.n_audio_ctx)
                                  ).astype(np.float32)
        fcfg = dc.replace(CFG, attention="flash")
        enc = m.encoder_forward(params, jnp.asarray(mel), fcfg)
        prompt = jnp.asarray([1, 2], jnp.int32)

        def run(cfg):
            t, l, _ = jax.jit(lambda p, e: beam_search_batched(
                p, e, prompt, cfg, eot_id=0, beam_size=2, max_depth=4,
                self_quant=True))(params, enc)
            return np.asarray(t), np.asarray(l)

        t0, l0 = run(fcfg)
        t1, l1 = run(dc.replace(fcfg, knobs=KernelKnobs(fused_permute=False)))
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_array_equal(t0, t1)
