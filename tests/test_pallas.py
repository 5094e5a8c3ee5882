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



    def test_odd_head_count_group1(self, rng):
        """n_head=3 forces the G=1 grouping fallback."""
        q, k, v = _qkv(rng, s=96, d=192)
        ref = qkv_attention(q, k, v, n_head=3)
        out = attention_bhsd(q, k, v, n_head=3, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_matches_legacy_kernel(self, rng, monkeypatch):
        q, k, v = _qkv(rng, s=200)
        new = attention_bhsd(q, k, v, n_head=2, interpret=True)
        monkeypatch.setenv("WHISPER_TPU_FLASH_IMPL", "legacy")
        old = attention_bhsd(q, k, v, n_head=2, interpret=True)
        np.testing.assert_allclose(np.asarray(new), np.asarray(old), atol=2e-6)



class TestDecodeAttention:
    def test_matches_xla_cached_attention(self, rng):
        from whisper_tpu.models.whisper import _cached_attention
        from whisper_tpu.ops.pallas.decode_attention import decode_attention

        B, H, C, HD = 3, 4, 32, 64
        D = H * HD
        q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, C, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, C, D)).astype(np.float32))
        for pos in (0, 5, C - 1):
            ref = _cached_attention(q, k, v, jnp.asarray([pos]), H, impl="xla")
            out = decode_attention(
                q[:, 0] * (HD ** -0.5), k, v, jnp.int32(pos), H, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref[:, 0]), atol=2e-5
            )

    def test_unaligned_kv_len(self, rng):
        """C not a multiple of the sublane tile (e.g. 750 cross keys)."""
        from whisper_tpu.models.whisper import _cached_attention
        from whisper_tpu.ops.pallas.decode_attention import decode_attention

        B, H, C, HD = 2, 2, 30, 64
        D = H * HD
        q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, C, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, C, D)).astype(np.float32))
        ref = _cached_attention(q, k, v, jnp.asarray([C - 1]), H, impl="xla")
        out = decode_attention(
            q[:, 0] * (HD ** -0.5), k, v, jnp.int32(C - 1), H, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, 0]),
                                   atol=2e-5)

    def test_per_row_pos(self, rng):
        """pos may differ per batch row (needed under vmap batching)."""
        from whisper_tpu.models.whisper import _cached_attention
        from whisper_tpu.ops.pallas.decode_attention import decode_attention

        B, H, C, HD = 3, 2, 16, 64
        D = H * HD
        q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, C, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, C, D)).astype(np.float32))
        pos = jnp.asarray([0, 5, C - 1], jnp.int32)
        out = decode_attention(q[:, 0] * (HD ** -0.5), k, v, pos, H,
                               interpret=True)
        for i in range(B):
            ref = _cached_attention(
                q[i : i + 1], k[i : i + 1], v[i : i + 1],
                jnp.asarray([int(pos[i])]), H, impl="xla",
            )
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(ref[0, 0]), atol=2e-5
            )

    def test_vmap_flattens_into_grid(self, rng):
        """vmap over windows == flattened call (the batched-beam TPU path;
        pallas's default batching rule cannot lower the SMEM pos block)."""
        from whisper_tpu.ops.pallas.decode_attention import decode_attention

        W, B, H, C, HD = 2, 3, 2, 16, 64
        D = H * HD
        q = jnp.asarray(rng.standard_normal((W, B, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((W, B, C, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((W, B, C, D)).astype(np.float32))
        pos = jnp.asarray([3, C - 1], jnp.int32)  # one scalar per window

        out = jax.vmap(
            lambda qq, kk, vv, pp: decode_attention(qq, kk, vv, pp, H,
                                                    interpret=True)
        )(q, k, v, pos)

        flat = decode_attention(
            q.reshape(W * B, D), k.reshape(W * B, C, D),
            v.reshape(W * B, C, D),
            jnp.repeat(pos, B), H, interpret=True,
        ).reshape(W, B, D)
        np.testing.assert_allclose(np.asarray(out), np.asarray(flat),
                                   atol=1e-6)

    def test_full_decoder_step_flash_vs_xla(self, rng):
        """decoder_step with impl=flash (interpret) == impl=xla, S=1."""
        import dataclasses

        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.models import whisper as M

        cfg = tiny_test_config(n_state=128, n_head=2, n_vocab=64)
        cfgf = dataclasses.replace(cfg, attention="flash")
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(rng.standard_normal((1, 16, 128)).astype(np.float32))
        toks = jnp.asarray(rng.integers(0, 64, (1, 4)).astype(np.int32))

        cache_x = M.init_cache(params, enc, cfg)
        lx, cache_x = M.decoder_step(params, toks, jnp.int32(0), cache_x, cfg)
        cache_f = M.init_cache(params, enc, cfgf)
        lf, cache_f = M.decoder_step(params, toks, jnp.int32(0), cache_f, cfgf)
        np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), atol=2e-4)

        one = jnp.asarray([[7]], jnp.int32)
        lx, _ = M.decoder_step(params, one, jnp.int32(4), cache_x, cfg)
        lf, _ = M.decoder_step(params, one, jnp.int32(4), cache_f, cfgf)
        np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), atol=2e-4)


class TestDequantMatmul:
    @staticmethod
    def _w8a8_ref(x, q, scale):
        """Exact host reference of the W8A8 path (integer accumulate)."""
        x32 = np.asarray(x, np.float32)
        absmax = np.abs(x32).max(axis=1, keepdims=True)
        xs = np.where(absmax > 0, absmax / 127.0, 1.0)
        xq = np.clip(np.round(x32 / xs), -127, 127).astype(np.int64)
        acc = xq @ np.asarray(q, np.int64)
        return acc.astype(np.float32) * xs * np.asarray(scale)[None, :]

    def test_matches_w8a8_reference(self, rng):
        from whisper_tpu.ops.pallas.dequant_matmul import quantized_matmul
        from whisper_tpu.quantize import quantize_tensor

        w = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32))
        qt = quantize_tensor(w)
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        ref = self._w8a8_ref(x, qt.q, qt.scale)
        out = quantized_matmul(x, qt.q, qt.scale, block_n=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    def test_close_to_float_matmul(self, rng):
        """W8A8-dynamic stays within ~1% of the float result."""
        from whisper_tpu.ops.pallas.dequant_matmul import quantized_matmul
        from whisper_tpu.quantize import quantize_tensor

        w = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32))
        qt = quantize_tensor(w)
        x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
        out = quantized_matmul(x, qt.q, qt.scale, block_n=128, interpret=True)
        exact = np.asarray(x) @ np.asarray(w)
        err = np.abs(np.asarray(out) - exact).max() / np.abs(exact).max()
        assert err < 0.03, err

    def test_vmap_flattens(self, rng):
        """vmapped (batched-beam) calls flatten into M via the custom rule."""
        from whisper_tpu.ops.pallas.dequant_matmul import dequant_matmul
        from whisper_tpu.quantize import quantize_tensor

        w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
        qt = quantize_tensor(w)
        x = jnp.asarray(rng.standard_normal((3, 4, 128)).astype(np.float32))
        out = jax.vmap(
            lambda xx: dequant_matmul(xx, qt.q, qt.scale, block_n=128,
                                      interpret=True)
        )(x)
        flat = dequant_matmul(x.reshape(12, 128), qt.q, qt.scale,
                              block_n=128, interpret=True).reshape(3, 4, 256)
        np.testing.assert_allclose(np.asarray(out), np.asarray(flat),
                                   atol=1e-6)

    def test_quantized_decoder_step_uses_kernel_path(self, rng):
        """QTensor decoder_step output equal between kernel (interpret) and
        the XLA fallback on CPU shapes that satisfy the alignment gate."""
        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.models import whisper as M
        from whisper_tpu.quantize import quantize_params

        cfg = tiny_test_config(n_state=128, n_head=2, n_vocab=128)
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        qp = quantize_params(params)
        enc = jnp.asarray(rng.standard_normal((1, 16, 128)).astype(np.float32))
        toks = jnp.asarray(rng.integers(0, 128, (1, 6)).astype(np.int32))
        cache = M.init_cache(qp, enc, cfg)
        logits, _ = M.decoder_step(qp, toks, jnp.int32(0), cache, cfg)
        full = M.decoder_forward(qp, toks, enc, cfg)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(full),
                                   atol=3e-4)

    def test_vmap_batched_weights_falls_back(self, rng):
        """Stacked per-layer weights under vmap (cross-KV prefill) use the
        XLA dequant path with correct batching."""
        from whisper_tpu.ops.pallas.dequant_matmul import dequant_matmul
        from whisper_tpu.quantize import quantize_tensor

        L, M, K, N = 3, 6, 128, 256
        ws = rng.standard_normal((L, K, N)).astype(np.float32)
        qts = [quantize_tensor(jnp.asarray(w)) for w in ws]
        q = jnp.stack([t.q for t in qts])
        s = jnp.stack([t.scale for t in qts])
        x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

        out = jax.vmap(
            lambda qq, ss: dequant_matmul(x, qq, ss, block_n=128,
                                          interpret=True)
        )(q, s)
        for i in range(L):
            # the batched-weights fallback is the XLA bf16-dequant path
            # (bf16 inputs, f32 accumulate)
            ref = jax.lax.dot_general(
                x.astype(jnp.bfloat16), q[i].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * s[i]
            np.testing.assert_allclose(np.asarray(out[i]), np.asarray(ref),
                                       atol=1e-5)

    def test_n_not_divisible_by_block(self, rng):
        """N=384 with block_n=512 must still fill every output column
        (regression: grid floor-division left trailing columns unwritten)."""
        from whisper_tpu.ops.pallas.dequant_matmul import dequant_matmul
        from whisper_tpu.quantize import quantize_tensor

        w = jnp.asarray(rng.standard_normal((128, 384)).astype(np.float32))
        qt = quantize_tensor(w)
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        out = dequant_matmul(x, qt.q, qt.scale, block_n=512, interpret=True)
        ref = self._w8a8_ref(x, qt.q, qt.scale)
        assert out.shape == (4, 384)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
        assert np.isfinite(np.asarray(out)).all()


class TestPermuteLanes:
    """The beam-reshuffle DMA-permute kernel (ops/pallas/permute.py)."""

    def test_matches_take(self, rng):
        from whisper_tpu.ops.pallas.permute import permute_lanes_pair

        b, l, c, d = 6, 4, 16, 128
        k = jnp.asarray(rng.standard_normal((b, l, c, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, l, c, d)), jnp.bfloat16)
        for par in ([2, 2, 0, 5, 1, 3], [0] * 6, [5, 4, 3, 2, 1, 0]):
            p = jnp.asarray(par, jnp.int32)
            ko, vo = permute_lanes_pair(k, v, p, interpret=True)
            assert jnp.array_equal(ko, jnp.take(k, p, axis=0))
            assert jnp.array_equal(vo, jnp.take(v, p, axis=0))

    def test_int8_dtype(self, rng):
        from whisper_tpu.ops.pallas.permute import permute_lanes_pair

        b, l, c, d = 4, 2, 32, 128
        k = jnp.asarray(
            rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        v = jnp.asarray(
            rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        p = jnp.asarray([3, 0, 0, 2], jnp.int32)
        ko, vo = permute_lanes_pair(k, v, p, interpret=True)
        assert jnp.array_equal(ko, jnp.take(k, p, axis=0))
        assert jnp.array_equal(vo, jnp.take(v, p, axis=0))


class TestGroupedCrossAttention:
    """kv_rep grouped decode attention: rep lanes share one KV block and are
    scored in a single GEMM pair (ops/pallas/decode_attention.py
    _attend_group). bf16 storage engages the grouped path; parity target is
    the per-lane kernel on the lane-replicated cache."""

    def test_matches_replicated_per_lane(self, rng):
        from whisper_tpu.ops.pallas.decode_attention import (
            decode_attention_stacked,
        )

        L, W, rep, c, d, nh = 3, 2, 5, 64, 128, 4
        b = W * rep
        kc = jnp.asarray(rng.standard_normal((L, W, c, d)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((L, W, c, d)), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        pos = jnp.full((b,), c - 1, jnp.int32)
        kc_rep = jnp.repeat(kc, rep, axis=1)
        vc_rep = jnp.repeat(vc, rep, axis=1)
        for layer in range(L):
            grouped = decode_attention_stacked(
                q, kc, vc, pos, jnp.int32(layer), nh, interpret=True,
                kv_rep=rep,
            )
            ref = decode_attention_stacked(
                q, kc_rep, vc_rep, pos, jnp.int32(layer), nh, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(grouped, np.float32),
                np.asarray(ref, np.float32),
                rtol=2e-2, atol=2e-2,
            )

    def test_partial_visibility(self, rng):
        from whisper_tpu.ops.pallas.decode_attention import (
            decode_attention_stacked,
        )

        L, W, rep, c, d, nh = 2, 1, 2, 32, 128, 8
        b = W * rep
        kc = jnp.asarray(rng.standard_normal((L, W, c, d)), jnp.bfloat16)
        vc = jnp.asarray(rng.standard_normal((L, W, c, d)), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        pos = jnp.full((b,), 10, jnp.int32)  # uniform partial visibility
        out = decode_attention_stacked(
            q, kc, vc, pos, jnp.int32(1), nh, interpret=True, kv_rep=rep)
        ref = decode_attention_stacked(
            q, jnp.repeat(kc, rep, 1), jnp.repeat(vc, rep, 1), pos,
            jnp.int32(1), nh, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_valid_prefix(self, rng):
        from whisper_tpu.ops.pallas.permute import permute_lanes_arrays

        b, l, c, d = 4, 2, 64, 128
        k = jnp.asarray(rng.standard_normal((b, l, c, d)), jnp.bfloat16)
        ks = jnp.asarray(rng.standard_normal((b, l, c)), jnp.float32)
        p = jnp.asarray([2, 0, 3, 3], jnp.int32)
        for valid in (1, 31, 33, 64):
            ko, so = permute_lanes_arrays(
                (k, ks), p, interpret=True,
                valid_len=jnp.int32(valid), chunk=32)
            nv = -(-valid // 32) * 32
            rows = min(nv, c)
            assert jnp.array_equal(
                ko[:, :, :rows], jnp.take(k, p, axis=0)[:, :, :rows])
            assert jnp.array_equal(
                so[:, :, :rows], jnp.take(ks, p, axis=0)[:, :, :rows])


class TestValidPrefixRead:
    """`c_used` valid-prefix block reads of the stacked decode kernel: with
    every pos < c_used the result must be bit-identical to the full-C read
    (the excluded rows are masked to -inf weight either way)."""

    def test_plain_matches_full(self, rng):
        from whisper_tpu.ops.pallas.decode_attention import (
            decode_attention_stacked,
        )

        b, l, c, d, nh = 4, 2, 128, 128, 4
        k = jnp.asarray(rng.standard_normal((b, l, c, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, l, c, d)), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        for pos, cu in ((0, 32), (30, 32), (31, 32), (63, 64), (95, 96)):
            pos_b = jnp.full((b,), pos, jnp.int32)
            out = decode_attention_stacked(
                q, k, v, pos_b, jnp.int32(1), nh, interpret=True,
                batch_major=True, c_used=cu)
            ref = decode_attention_stacked(
                q, k, v, pos_b, jnp.int32(1), nh, interpret=True,
                batch_major=True)
            assert jnp.array_equal(out, ref), (pos, cu)

    def test_scaled_matches_full(self, rng):
        from whisper_tpu.ops.pallas.decode_attention import (
            decode_attention_stacked,
        )

        b, l, c, d, nh = 4, 2, 64, 128, 4
        k = jnp.asarray(rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        ks = jnp.asarray(
            rng.uniform(0.01, 0.05, (b, l, c)).astype(np.float32))
        vs = jnp.asarray(
            rng.uniform(0.01, 0.05, (b, l, c)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        for pos, cu in ((5, 32), (31, 32), (40, 64)):
            pos_b = jnp.full((b,), pos, jnp.int32)
            out = decode_attention_stacked(
                q, k, v, pos_b, jnp.int32(0), nh, interpret=True,
                batch_major=True, k_rowscale=ks, v_rowscale=vs, c_used=cu)
            ref = decode_attention_stacked(
                q, k, v, pos_b, jnp.int32(0), nh, interpret=True,
                batch_major=True, k_rowscale=ks, v_rowscale=vs)
            assert jnp.array_equal(out, ref), (pos, cu)

    def test_misaligned_falls_back(self, rng):
        from whisper_tpu.ops.pallas.decode_attention import (
            decode_attention_stacked,
        )

        b, l, c, d, nh = 2, 1, 64, 128, 4
        k = jnp.asarray(rng.standard_normal((b, l, c, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, l, c, d)), jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        pos_b = jnp.full((b,), 3, jnp.int32)
        out = decode_attention_stacked(
            q, k, v, pos_b, jnp.int32(0), nh, interpret=True,
            batch_major=True, c_used=48)  # not a 32-multiple -> full read
        ref = decode_attention_stacked(
            q, k, v, pos_b, jnp.int32(0), nh, interpret=True,
            batch_major=True)
        assert jnp.array_equal(out, ref)


class TestBigW8A8Matmul:
    """Large-M tiled W8A8 kernel (encoder shapes; dequant_matmul.py)."""

    def test_matches_reference(self, rng):
        from whisper_tpu.ops.pallas.dequant_matmul import quantized_matmul_big

        m, k, n = 320, 128, 256
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        absmax = np.abs(w).max(0)
        ws = absmax / 127.0
        wq = jnp.asarray(np.clip(np.round(w / ws), -127, 127), jnp.int8)
        out = quantized_matmul_big(
            x, wq, jnp.asarray(ws, jnp.float32), block_m=128, block_n=128,
            out_dtype=jnp.float32, interpret=True)
        # reference: row-quantized x against dequantized w
        xa = np.abs(np.asarray(x)).max(1, keepdims=True)
        xs = np.where(xa > 0, xa / 127.0, 1.0)
        xq = np.clip(np.round(np.asarray(x) / xs), -127, 127)
        ref = (xq @ np.asarray(wq, np.float32)) * xs * ws
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)

    def test_ragged_m(self, rng):
        from whisper_tpu.ops.pallas.dequant_matmul import quantized_matmul_big

        m, k, n = 200, 128, 128  # m not a multiple of block_m
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.ones((n,), jnp.float32)
        out = quantized_matmul_big(
            x, wq, ws, block_m=128, block_n=128, out_dtype=jnp.float32,
            interpret=True)
        assert out.shape == (m, n)
        assert np.isfinite(np.asarray(out)).all()

    def test_vmap_batched_weights_falls_back(self, rng):
        """init_cache's per-layer vmap pattern: batched weights must take
        the XLA path, not Pallas's default (wrong) batching rule."""
        from whisper_tpu.ops.pallas.dequant_matmul import quantized_matmul_big

        L, m, k, n = 3, 2048, 128, 128
        x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        wq = jnp.asarray(rng.integers(-127, 128, (L, k, n)), jnp.int8)
        ws = jnp.full((L, n), 0.01, jnp.float32)
        out = jax.vmap(
            lambda w, s: quantized_matmul_big(
                x, w, s, out_dtype=jnp.float32, interpret=True),
        )(wq, ws)
        ref = np.einsum(
            "mk,lkn->lmn", np.asarray(x), np.asarray(wq, np.float32)
        ) * np.asarray(ws)[:, None, :]
        # bf16 GEMM tolerance; the default-Pallas-vmap bug this guards
        # against was wrong by ~2.8 absolute (vs a ~5e-4 noise floor)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-2, atol=0.1)


class TestFusedPermuteAttention:
    """decode_attention_permute_fused == permute + append + stacked scaled
    attention, bit-identically (int8 self-KV beam path)."""

    def _mk(self, rng, b, l, c, d):
        k = jnp.asarray(rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        ks = jnp.asarray(
            rng.uniform(0.01, 0.05, (b, l, c)).astype(np.float32))
        vs = jnp.asarray(
            rng.uniform(0.01, 0.05, (b, l, c)).astype(np.float32))
        return k, v, ks, vs

    def _reference(self, k, v, ks, vs, nk, nv, nks, nvs, parents, pos,
                   layer, q, nh, cu):
        """Unfused semantics: permute by parents, append at pos, attend."""
        from whisper_tpu.ops.pallas.decode_attention import (
            decode_attention_stacked,
        )

        b = k.shape[0]
        kp = jnp.take(k, parents, axis=0)
        vp = jnp.take(v, parents, axis=0)
        ksp = jnp.take(ks, parents, axis=0)
        vsp = jnp.take(vs, parents, axis=0)
        li = int(layer)
        kp = kp.at[:, li, pos].set(nk)
        vp = vp.at[:, li, pos].set(nv)
        ksp = ksp.at[:, li, pos].set(nks)
        vsp = vsp.at[:, li, pos].set(nvs)
        pos_b = jnp.full((b,), pos, jnp.int32)
        out = decode_attention_stacked(
            q, kp, vp, pos_b, jnp.int32(li), nh, interpret=True,
            batch_major=True, k_rowscale=ksp, v_rowscale=vsp, c_used=cu)
        return out, kp, vp, ksp, vsp

    @pytest.mark.parametrize("pos,cu", [(0, 32), (17, 32), (31, 32),
                                        (40, 64), (63, 64)])
    def test_matches_unfused(self, rng, pos, cu):
        from whisper_tpu.ops.pallas.permute_attention import (
            decode_attention_permute_fused,
        )

        beam_k, nw, l, c, d, nh = 5, 3, 2, 64, 128, 4
        b = beam_k * nw
        k, v, ks, vs = self._mk(rng, b, l, c, d)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        nk = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
        nv = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
        nks = jnp.asarray(rng.uniform(0.01, 0.05, (b,)).astype(np.float32))
        nvs = jnp.asarray(rng.uniform(0.01, 0.05, (b,)).astype(np.float32))
        # window-local parents (the beam contract)
        parents = jnp.asarray(
            rng.integers(0, beam_k, (b,))
            + (np.arange(b) // beam_k) * beam_k, jnp.int32)
        layer = 1

        out, ko, vo, kso, vso = decode_attention_permute_fused(
            q, k, v, ks, vs, nk, nv, nks, nvs, parents,
            jnp.int32(pos), jnp.int32(layer), nh, beam_k, c_used=cu,
            interpret=True)
        ref, kr, vr, ksr, vsr = self._reference(
            k, v, ks, vs, nk, nv, nks, nvs, parents, pos, layer, q, nh, cu)

        assert jnp.array_equal(out, ref)
        # permuted+appended cache rows [0, cu) of the touched layer match;
        # untouched layers must be preserved verbatim (aliasing semantics)
        assert jnp.array_equal(ko[:, layer, :cu], kr[:, layer, :cu])
        assert jnp.array_equal(vo[:, layer, :cu], vr[:, layer, :cu])
        assert jnp.array_equal(kso[:, layer], ksr[:, layer])
        assert jnp.array_equal(vso[:, layer], vsr[:, layer])
        other = 1 - layer
        assert jnp.array_equal(ko[:, other], k[:, other])
        assert jnp.array_equal(vo[:, other], v[:, other])
        assert jnp.array_equal(kso[:, other], ks[:, other])
        assert jnp.array_equal(vso[:, other], vs[:, other])

    def test_single_window_and_identity_parents(self, rng):
        from whisper_tpu.ops.pallas.permute_attention import (
            decode_attention_permute_fused,
        )

        beam_k, l, c, d, nh = 4, 1, 32, 128, 4
        b = beam_k
        k, v, ks, vs = self._mk(rng, b, l, c, d)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        nk = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
        nv = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
        nks = jnp.asarray(rng.uniform(0.01, 0.05, (b,)).astype(np.float32))
        nvs = jnp.asarray(rng.uniform(0.01, 0.05, (b,)).astype(np.float32))
        parents = jnp.arange(b, dtype=jnp.int32)  # identity reshuffle

        out, ko, vo, kso, vso = decode_attention_permute_fused(
            q, k, v, ks, vs, nk, nv, nks, nvs, parents,
            jnp.int32(7), jnp.int32(0), nh, beam_k, interpret=True)
        ref, kr, vr, ksr, vsr = self._reference(
            k, v, ks, vs, nk, nv, nks, nvs, parents, 7, 0, q, nh, c)
        assert jnp.array_equal(out, ref)
        assert jnp.array_equal(ko, kr)
        assert jnp.array_equal(kso, ksr)


class TestCowReshuffle:
    """Copy-on-write beam reshuffle: the slot assignment's invariants, the
    kernel's dests semantics, and token identity with COW on vs off."""

    def test_cow_assign_invariants(self, rng):
        from whisper_tpu.decode.beam import _cow_assign

        W, K = 7, 5
        for _ in range(20):
            parent = jnp.asarray(rng.integers(0, K, (W, K)), jnp.int32)
            # phys: random permutation per window (what prior steps produce)
            phys = jnp.asarray(
                np.stack([rng.permutation(K) for _ in range(W)]), jnp.int32)
            src, dest = _cow_assign(parent, phys)
            src_n, dest_n = np.asarray(src), np.asarray(dest)
            phys_n, par_n = np.asarray(phys), np.asarray(parent)
            for w in range(W):
                # src reads the parent's physical slot
                assert np.array_equal(src_n[w], phys_n[w][par_n[w]])
                # dest is a permutation (next phys stays injective)
                assert sorted(dest_n[w]) == list(range(K))
                seen = set()
                for i in range(K):
                    if src_n[w, i] not in seen:
                        # first claimant stays -> elided full write
                        assert dest_n[w, i] == src_n[w, i]
                        seen.add(src_n[w, i])
                    else:
                        # movers land on free slots (nobody reads them)
                        assert dest_n[w, i] not in src_n[w]

    def test_compute_stage_invariants(self, rng):
        from whisper_tpu.ops.pallas.permute_attention import compute_stage

        K, nw = 5, 6
        b = K * nw
        parents = jnp.asarray(
            rng.integers(0, K, (b,)) + (np.arange(b) // K) * K, jnp.int32)
        stage = np.asarray(compute_stage(parents, K))
        par = np.asarray(parents)
        for i in range(b):
            w0 = (i // K) * K
            # stage is the FIRST same-parent lane in the window
            assert stage[i] == min(
                j for j in range(w0, w0 + K) if par[j] == par[i])
            assert stage[i] <= i
            assert par[stage[i]] == par[i]
            assert stage[stage[i]] == stage[i]  # primaries self-stage

    def test_kernel_dests_physical_layout(self, rng):
        """decode_attention_permute_fused(dests=...): attention output is
        logical, the cache lands at dests, untouched slots are preserved."""
        from whisper_tpu.decode.beam import _cow_assign
        from whisper_tpu.ops.pallas.decode_attention import (
            decode_attention_stacked,
        )
        from whisper_tpu.ops.pallas.permute_attention import (
            decode_attention_permute_fused,
        )

        beam_k, nw, l, c, d, nh = 4, 2, 2, 64, 128, 4
        b = beam_k * nw
        pos, cu, layer = 33, 64, 1
        k = jnp.asarray(rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, (b, l, c, d)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.05, (b, l, c)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.05, (b, l, c)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((b, d)), jnp.bfloat16)
        nk = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
        nv = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
        nks = jnp.asarray(rng.uniform(0.01, 0.05, (b,)), jnp.float32)
        nvs = jnp.asarray(rng.uniform(0.01, 0.05, (b,)), jnp.float32)
        parent = jnp.asarray(rng.integers(0, beam_k, (nw, beam_k)), jnp.int32)
        phys = jnp.broadcast_to(
            jnp.arange(beam_k, dtype=jnp.int32), (nw, beam_k))
        src, dest = _cow_assign(parent, phys)
        offs = jnp.arange(nw, dtype=jnp.int32)[:, None] * beam_k
        src_g = (src + offs).reshape(b)
        dest_g = (dest + offs).reshape(b)

        out, ko, vo, kso, vso = decode_attention_permute_fused(
            q, k, v, ks, vs, nk, nv, nks, nvs, src_g,
            jnp.int32(pos), jnp.int32(layer), nh, beam_k, c_used=cu,
            dests=dest_g, interpret=True)

        # logical reference: permute by src, append, attend
        kp = jnp.take(k, src_g, axis=0).at[:, layer, pos].set(nk)
        vp = jnp.take(v, src_g, axis=0).at[:, layer, pos].set(nv)
        ksp = jnp.take(ks, src_g, axis=0).at[:, layer, pos].set(nks)
        vsp = jnp.take(vs, src_g, axis=0).at[:, layer, pos].set(nvs)
        ref = decode_attention_stacked(
            q, kp, vp, jnp.full((b,), pos, jnp.int32), jnp.int32(layer), nh,
            interpret=True, batch_major=True, k_rowscale=ksp, v_rowscale=vsp,
            c_used=cu)
        assert jnp.array_equal(out, ref)  # attention is logical-order
        # physical layout: logical lane i's slab sits at slot dest_g[i]
        dg = np.asarray(dest_g)
        for i in range(b):
            assert jnp.array_equal(ko[dg[i], layer, :cu], kp[i, layer, :cu])
            assert jnp.array_equal(vo[dg[i], layer, :cu], vp[i, layer, :cu])
            assert jnp.array_equal(kso[dg[i], layer], ksp[i, layer])
            assert jnp.array_equal(vso[dg[i], layer], vsp[i, layer])
        # slots outside the dests image and other layers are untouched
        other = 1 - layer
        assert jnp.array_equal(ko[:, other], k[:, other])
        assert jnp.array_equal(vso[:, other], vs[:, other])
        for s in range(b):
            if s not in dg:
                assert jnp.array_equal(ko[s, layer], k[s, layer])
                assert jnp.array_equal(kso[s, layer], ks[s, layer])

    def test_beam_tokens_cow_vs_physical(self, rng, monkeypatch):
        """Full beam searches (single + batched) are token-identical with
        COW on (default) vs off (whole-prefix physical write-back)."""
        import dataclasses

        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.decode.beam import beam_search, beam_search_batched
        from whisper_tpu.models import whisper as M

        cfg = dataclasses.replace(
            tiny_test_config(n_state=128, n_head=2, n_vocab=64,
                             n_text_ctx=64),
            attention="flash")
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(rng.standard_normal((3, 16, 128)).astype(np.float32))
        prompt = jnp.asarray([1, 2], jnp.int32)

        res = {}
        for cow in ("1", "0"):
            monkeypatch.setenv("WHISPER_TPU_COW", cow)
            toks, lens, logps = beam_search_batched(
                params, enc, prompt, cfg, eot_id=0, beam_size=3,
                max_depth=8, self_quant=True)
            t1, l1, p1 = beam_search(
                params, enc[:1], prompt, cfg, eot_id=0, beam_size=3,
                max_depth=8, self_quant=True)
            res[cow] = tuple(np.asarray(x)
                             for x in (toks, lens, logps, t1, l1, p1))
        for a, b in zip(res["1"], res["0"]):
            np.testing.assert_allclose(a, b, atol=1e-5)


class TestFusedReshuffleIntegration:
    """decoder_step(parents=...) (the fused beam path) == explicit permute
    then decoder_step, and the full batched beam search is token-identical
    with the fusion on vs off."""

    def test_step_matches_explicit_permute(self, rng):
        import dataclasses

        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.models import whisper as M
        from whisper_tpu.quantize import QTensor

        cfg = dataclasses.replace(
            tiny_test_config(n_state=128, n_head=2, n_vocab=64,
                             n_text_ctx=64),
            attention="flash")
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        K, W = 3, 2
        B = K * W
        enc = jnp.asarray(rng.standard_normal((W, 16, 128)).astype(np.float32))
        toks = jnp.asarray(rng.integers(0, 64, (B, 4)).astype(np.int32))

        cache = M.init_cache(params, enc, cfg, batch=B, cache_len=32,
                             self_quant=True)
        _, cache = M.decoder_step(params, toks, jnp.int32(0), cache, cfg)

        parents = jnp.asarray(
            rng.integers(0, K, (B,)) + (np.arange(B) // K) * K, jnp.int32)
        one = jnp.asarray(rng.integers(0, 64, (B, 1)).astype(np.int32))

        lf, cf = M.decoder_step(params, one, jnp.int32(4), cache, cfg,
                                parents=parents)

        def perm(qt):
            return QTensor(jnp.take(qt.q, parents, axis=0),
                           jnp.take(qt.scale, parents, axis=0))

        cache_p = M.DecoderCache(perm(cache.self_k), perm(cache.self_v),
                                 cache.cross_k, cache.cross_v)
        lx, cx = M.decoder_step(params, one, jnp.int32(4), cache_p, cfg)

        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), atol=1e-5)
        # caches agree on the written prefix (rows [0, 5))
        assert jnp.array_equal(cf.self_k.q[:, :, :5], cx.self_k.q[:, :, :5])
        assert jnp.array_equal(cf.self_v.q[:, :, :5], cx.self_v.q[:, :, :5])
        np.testing.assert_allclose(
            np.asarray(cf.self_k.scale[:, :, :5]),
            np.asarray(cx.self_k.scale[:, :, :5]))

    def test_batched_beam_tokens_fused_vs_not(self, rng, monkeypatch):
        import dataclasses

        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.decode.beam import beam_search_batched
        from whisper_tpu.models import whisper as M

        cfg = dataclasses.replace(
            tiny_test_config(n_state=128, n_head=2, n_vocab=64,
                             n_text_ctx=64),
            attention="flash")
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(rng.standard_normal((2, 16, 128)).astype(np.float32))
        prompt = jnp.asarray([1, 2], jnp.int32)

        results = {}
        for fused in ("1", "0"):
            monkeypatch.setenv("WHISPER_TPU_FUSED_PERMUTE", fused)
            toks, lens, logps = beam_search_batched(
                params, enc, prompt, cfg, eot_id=0, beam_size=3,
                max_depth=8, self_quant=True)
            results[fused] = (np.asarray(toks), np.asarray(lens),
                              np.asarray(logps))

        t1, l1, p1 = results["1"]
        t0, l0, p0 = results["0"]
        assert np.array_equal(l1, l0)
        for w in range(t1.shape[0]):
            assert np.array_equal(t1[w, :l1[w]], t0[w, :l0[w]]), w
        np.testing.assert_allclose(p1, p0, atol=1e-5)

    def test_greedy_tokens_fused_append_vs_dus(self, rng, monkeypatch):
        import dataclasses

        from whisper_tpu.config import tiny_test_config
        from whisper_tpu.decode.greedy import greedy_decode
        from whisper_tpu.models import whisper as M

        cfg = dataclasses.replace(
            tiny_test_config(n_state=128, n_head=2, n_vocab=64,
                             n_text_ctx=64),
            attention="flash")
        params = M.init_params(jax.random.PRNGKey(0), cfg)
        enc = jnp.asarray(rng.standard_normal((3, 16, 128)).astype(np.float32))
        prompt = jnp.asarray([1, 2], jnp.int32)

        results = {}
        for fused in ("1", "0"):
            monkeypatch.setenv("WHISPER_TPU_GREEDY_FUSED_APPEND", fused)
            toks, lens, logps = greedy_decode(
                params, enc, prompt, cfg, eot_id=0, max_depth=8,
                self_quant=True)
            results[fused] = (np.asarray(toks), np.asarray(lens),
                              np.asarray(logps))
        t1, l1, p1 = results["1"]
        t0, l0, p0 = results["0"]
        assert np.array_equal(l1, l0)
        for b in range(t1.shape[0]):
            assert np.array_equal(t1[b, :l1[b]], t0[b, :l0[b]]), b
        np.testing.assert_allclose(p1, p0, atol=1e-5)


class TestFusedMlpBlock:
    """fused_mlp_block == x + gelu_exact(ln(x) @ w1 + b1) @ w2 + b2.

    The kernel keeps ln/gelu/accumulator in f32 where the XLA sequence
    rounds intermediates to bf16, so comparison is against an f32 reference
    at bf16-level tolerance (one rounding step), not bit-exact.
    """

    def _make(self, rng, m, d, h, dtype=jnp.bfloat16):
        def t(shape, scale=0.05):
            return jnp.asarray(
                rng.standard_normal(shape).astype(np.float32) * scale, dtype)
        return (t((m, d), 0.5), t((d,), 1.0) + 1.0, t((d,)),
                t((d, h)), t((h,)), t((h, d)), t((d,)))

    @staticmethod
    def _ref_f32(x, g, b, w1, b1, w2, b2, eps=1e-5):
        from whisper_tpu.models.whisper import layer_norm
        f = jnp.float32
        hn = layer_norm(x.astype(f), g.astype(f), b.astype(f), eps)
        t = jax.nn.gelu(hn @ w1.astype(f) + b1.astype(f), approximate=False)
        return x.astype(f) + t @ w2.astype(f) + b2.astype(f)

    @pytest.mark.parametrize("m,block_m", [(256, 1024), (300, 128)])
    def test_matches_reference(self, rng, m, block_m):
        from whisper_tpu.ops.pallas.encoder_block import fused_mlp_block
        d, h = 256, 1024
        x, g, b, w1, b1, w2, b2 = self._make(rng, m, d, h)
        out = fused_mlp_block(x, g, b, w1, b1, w2, b2, eps=1e-5,
                              block_m=block_m, block_h=256, interpret=True)
        ref = self._ref_f32(x, g, b, w1, b1, w2, b2)
        assert out.dtype == x.dtype
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=0.06, rtol=0.05)

    def test_leading_axes(self, rng):
        from whisper_tpu.ops.pallas.encoder_block import fused_mlp_block
        d, h = 256, 1024
        x, g, b, w1, b1, w2, b2 = self._make(rng, 6 * 32, d, h)
        x3 = x.reshape(6, 32, d)
        out = fused_mlp_block(x3, g, b, w1, b1, w2, b2, block_m=64,
                              block_h=256, interpret=True)
        flat = fused_mlp_block(x, g, b, w1, b1, w2, b2, block_m=64,
                               block_h=256, interpret=True)
        assert out.shape == (6, 32, d)
        np.testing.assert_array_equal(
            np.asarray(out).reshape(-1, d), np.asarray(flat))
