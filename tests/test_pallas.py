"""Pallas kernel tests (interpret mode on CPU; the real-TPU path is exercised
by bench.py and the verify drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.models.whisper import qkv_attention, causal_mask
from whisper_tpu.ops.pallas.flash_attention import attention_bhsd


def _qkv(rng, b=2, s=96, d=128, sk=None):
    sk = sk or s
    q = rng.standard_normal((b, s, d)).astype(np.float32)
    k = rng.standard_normal((b, sk, d)).astype(np.float32)
    v = rng.standard_normal((b, sk, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashAttention:
    @pytest.mark.parametrize("s", [64, 96, 200])
    def test_matches_xla_attention(self, rng, s):
        q, k, v = _qkv(rng, s=s)
        ref = qkv_attention(q, k, v, n_head=2)
        out = attention_bhsd(q, k, v, n_head=2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_causal_matches_masked_xla(self, rng):
        q, k, v = _qkv(rng, s=64)
        ref = qkv_attention(q, k, v, n_head=2, mask=causal_mask(64, 64))
        out = attention_bhsd(q, k, v, n_head=2, causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_shaped(self, rng):
        """Sq != Sk (cross-attention shapes: 448 queries vs 750 keys)."""
        q, k, v = _qkv(rng, s=56, sk=200)
        ref = qkv_attention(q, k, v, n_head=2)
        out = attention_bhsd(q, k, v, n_head=2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_unaligned_kv_len_masked(self, rng):
        """Sk=130 pads to 256 -- padded keys must not leak into the softmax."""
        q, k, v = _qkv(rng, s=32, sk=130)
        ref = qkv_attention(q, k, v, n_head=2)
        out = attention_bhsd(q, k, v, n_head=2, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_bf16(self, rng):
        q, k, v = _qkv(rng, s=64)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        ref = qkv_attention(q, k, v, n_head=2)
        out = attention_bhsd(q, k, v, n_head=2, interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )


class TestFusedLogMel:
    @pytest.mark.parametrize("n", [4000, 8000])
    def test_matches_xla_prep_audio(self, rng, n):
        from whisper_tpu.ops.audio import prep_audio
        from whisper_tpu.ops.pallas.logmel import prep_audio_fused

        x = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1)
        ref = prep_audio(x)
        out = prep_audio_fused(x, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_batched_per_sample_max(self, rng):
        from whisper_tpu.ops.audio import prep_audio
        from whisper_tpu.ops.pallas.logmel import prep_audio_fused

        x = jnp.asarray(rng.standard_normal((3, 4800)).astype(np.float32))
        ref = prep_audio(x, per_sample_max=True)
        out = prep_audio_fused(x, per_sample_max=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_silence(self):
        from whisper_tpu.ops.pallas.logmel import prep_audio_fused

        out = prep_audio_fused(jnp.zeros((1, 4000)), interpret=True)
        np.testing.assert_allclose(np.asarray(out), -1.5, atol=1e-5)
