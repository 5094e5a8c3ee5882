"""Weight-only int8 quantization tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu import quantize
from whisper_tpu.config import tiny_test_config
from whisper_tpu.decode import greedy
from whisper_tpu.models import whisper as M

CFG = tiny_test_config(n_state=64, n_head=2, n_vocab=128)


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(0), CFG)


@pytest.fixture(scope="module")
def qparams(params):
    return quantize.quantize_params(params)


class TestQTensor:
    def test_round_trip_error_bounded(self, rng):
        w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
        qt = quantize.quantize_tensor(w)
        assert qt.q.dtype == jnp.int8
        deq = quantize.dequantize(qt, jnp.float32)
        # per-column max error <= scale/2 (symmetric rounding)
        err = np.abs(np.asarray(deq) - np.asarray(w))
        assert (err <= np.asarray(qt.scale)[None, :] * 0.5 + 1e-7).all()

    def test_zero_column(self):
        w = jnp.zeros((8, 4))
        qt = quantize.quantize_tensor(w)
        np.testing.assert_array_equal(np.asarray(qt.q), 0)


class TestQuantizedModel:
    def test_structure(self, qparams):
        blk = qparams["decoder"]["blocks"]
        assert isinstance(blk["qkv_w"], quantize.QTensor)
        assert blk["qkv_w"].q.dtype == jnp.int8
        # layer norms untouched
        assert not isinstance(blk["attn_ln_g"], quantize.QTensor)
        # encoder untouched by default
        assert not isinstance(
            qparams["encoder"]["blocks"]["qkv_w"], quantize.QTensor
        )

    def test_decoder_forward_close(self, params, qparams, rng):
        enc = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
        toks = jnp.asarray(rng.integers(0, 128, (1, 8)).astype(np.int32))
        ref = M.decoder_forward(params, toks, enc, CFG)
        out = M.decoder_forward(qparams, toks, enc, CFG)
        # logits agree to int8 noise level
        ref, out = np.asarray(ref), np.asarray(out)
        denom = np.abs(ref).max()
        assert np.abs(out - ref).max() / denom < 0.05

    def test_greedy_runs_with_quantized(self, params, qparams, rng):
        mel = jnp.asarray(rng.standard_normal((1, 80, 32)).astype(np.float32))
        enc = M.encoder_forward(params, mel, CFG)
        prompt = jnp.asarray([1, 2, 3], jnp.int32)
        toks, lengths, _ = greedy.greedy_decode_jit(
            qparams, enc, prompt, CFG, eot_id=5, max_depth=6
        )
        assert int(lengths[0]) >= 3

    def test_cache_step_close(self, params, qparams, rng):
        enc = jnp.asarray(rng.standard_normal((1, 16, 64)).astype(np.float32))
        toks = jnp.asarray(rng.integers(0, 128, (1, 6)).astype(np.int32))
        cache = M.init_cache(qparams, enc, CFG)
        logits, _ = M.decoder_step(qparams, toks, jnp.int32(0), cache, CFG)
        full = M.decoder_forward(qparams, toks, enc, CFG)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full), atol=3e-4
        )

    def test_quantize_encoder_flag(self, params):
        qp = quantize.quantize_params(params, quantize_encoder=True)
        assert isinstance(qp["encoder"]["blocks"]["mlp1_w"], quantize.QTensor)
