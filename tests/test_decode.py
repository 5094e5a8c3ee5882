"""Decoding tests (SURVEY.md §4 item 4).

The strongest test here replicates the REFERENCE decode driver on the host --
full decoder recompute per step over all beams, exactly like
`mels_to_text`'s `beamsearch_next` closure (src/transcribe.rs:253-307) feeding
the generic `beam_search` (src/beam.rs) -- and asserts the on-device
while_loop beam search produces the identical token sequence on a random
tiny model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.config import tiny_test_config
from whisper_tpu.models import whisper as M
from whisper_tpu.decode import beam as dbeam
from whisper_tpu.decode import greedy as dgreedy
from whisper_tpu.decode import host_beam

CFG = tiny_test_config(n_vocab=32, n_text_ctx=24, n_audio_ctx=16)
EOT = 7  # arbitrary token id playing <|endoftext|>
SUPPRESS = [5, 6, 7, 30, 31]  # pretend these are "special" tokens


@pytest.fixture(scope="module")
def params():
    return M.init_params(jax.random.PRNGKey(3), CFG)


@pytest.fixture(scope="module")
def enc_out(params):
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((1, 80, CFG.audio_encoder_config.n_audio_ctx)).astype(
        np.float32
    )
    return M.encoder_forward(params, jnp.asarray(mel), CFG)


def _suppress_mask():
    m = np.zeros((CFG.text_decoder_config.n_vocab,), np.float32)
    m[SUPPRESS] = -np.inf
    return jnp.asarray(m)


def _reference_driver_beam(params, enc_out, prompt, beam_size, max_depth):
    """Host beam search with the reference's full-recompute next() closure."""
    suppress = np.asarray(_suppress_mask())

    def next_fn(beams):
        max_len = max(len(b.seq) for b in beams)
        toks = np.zeros((len(beams), max_len), np.int32)
        for i, b in enumerate(beams):
            toks[i, : len(b.seq)] = b.seq  # right-pad with 0 (transcribe.rs:254-268)
        enc_rep = jnp.broadcast_to(enc_out, (len(beams),) + enc_out.shape[1:])
        logits = np.asarray(
            M.decoder_forward(params, jnp.asarray(toks), enc_rep, CFG)
        ).astype(np.float64)
        if max_len <= 5:
            logits = logits + suppress[None, None, :]
        # log-softmax over vocab (f64 on host, like the reference's elem::<f64>)
        x = logits - logits.max(axis=-1, keepdims=True)
        logp = x - np.log(np.exp(x).sum(axis=-1, keepdims=True))
        out = []
        for i, b in enumerate(beams):
            row = logp[i, len(b.seq) - 1]
            out.append([(t, b.log_prob + row[t]) for t in range(len(row))])
        return out

    init = host_beam.BeamNode(list(prompt), 0.0)
    return host_beam.beam_search(
        [init], next_fn, lambda seq: len(seq) > 0 and seq[-1] == EOT,
        beam_size, max_depth,
    )


class TestHostBeamGeneric:
    """Unit tests of the generic API with a stub scorer (src/beam.rs parity)."""

    def test_simple_path(self):
        # vocab {0,1,2}; token 2 ends. Scores fixed per position.
        table = {
            (): [(0, -1.0), (1, -0.5), (2, -5.0)],
            (1,): [(0, -0.1), (1, -3.0), (2, -4.0)],
            (1, 0): [(0, -5.0), (1, -5.0), (2, -0.2)],
        }

        def next_fn(beams):
            return [
                [(t, b.log_prob + lp) for t, lp in table.get(tuple(b.seq), [(2, -0.01)])]
                for b in beams
            ]

        seq = host_beam.beam_search(
            [host_beam.BeamNode([], 0.0)],
            next_fn,
            lambda s: len(s) > 0 and s[-1] == 2,
            beam_size=2,
            max_depth=10,
        )
        assert seq == [1, 0, 2]

    def test_empty_beams(self):
        assert host_beam.beam_search([], lambda b: [], lambda s: False, 3, 5) == []

    def test_finished_beats_active_on_tie(self):
        # One beam finished at -1.0, expansion can only reach -1.0 too:
        # stop rule prefers the finished beam (last-max semantics).
        def next_fn(beams):
            return [[(0, -1.0), (1, -9.0)] for _ in beams]

        beams = [
            host_beam.BeamNode([9], -1.0),  # finished (ends with 9)
            host_beam.BeamNode([0], -0.0),
        ]
        seq = host_beam.beam_search(
            beams, next_fn, lambda s: s[-1] == 9, beam_size=2, max_depth=3
        )
        # step 1: active [0] expands to [0,0]@-1.0 and [0,1]@-9.0; [9] frozen.
        # step 2 stop-check: best is tie (-1.0); finished listed last wins.
        assert seq == [9]

    def test_max_depth_caps_steps(self):
        calls = []

        def next_fn(beams):
            calls.append(len(beams))
            return [[(0, b.log_prob - 1.0)] for b in beams]

        host_beam.beam_search(
            [host_beam.BeamNode([], 0.0)], next_fn, lambda s: False, 1, 4
        )
        assert len(calls) == 4


class TestDeviceBeamParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_reference_driver(self, params, enc_out, seed):
        """On-device beam search == host reference driver, token-exact."""
        prompt = np.array([3, 9, 11, 4], np.int32)  # 4-token prompt like SOT...
        ref = _reference_driver_beam(params, enc_out, prompt, beam_size=3, max_depth=12)

        toks, length, logp = dbeam.beam_search_jit(
            params,
            enc_out,
            jnp.asarray(prompt),
            CFG,
            eot_id=EOT,
            suppress_mask=_suppress_mask(),
            beam_size=3,
            max_depth=12,
        )
        ours = list(np.asarray(toks)[: int(length)])
        assert ours == ref

    def test_suppression_active_early(self, params, enc_out):
        """Suppressed tokens never appear while seq len <= 5."""
        prompt = np.array([3, 9, 11, 4], np.int32)
        toks, length, _ = dbeam.beam_search_jit(
            params,
            enc_out,
            jnp.asarray(prompt),
            CFG,
            eot_id=EOT,
            suppress_mask=_suppress_mask(),
            beam_size=3,
            max_depth=10,
        )
        seq = list(np.asarray(toks)[: int(length)])
        # positions 4 and 5 (0-based) are generated while len <= 5
        for pos in (4, 5):
            if pos < len(seq):
                assert seq[pos] not in SUPPRESS

    def test_max_depth_bound(self, params, enc_out):
        prompt = np.array([3, 9, 11, 4], np.int32)
        toks, length, _ = dbeam.beam_search_jit(
            params, enc_out, jnp.asarray(prompt), CFG,
            eot_id=EOT, beam_size=2, max_depth=5,
        )
        assert int(length) <= len(prompt) + 5


class TestGreedy:
    def test_matches_stepwise_argmax(self, params, enc_out):
        """Greedy decode == naive per-step argmax with full recompute."""
        prompt = np.array([3, 9, 11, 4], np.int32)
        suppress = np.asarray(_suppress_mask())

        seq = list(prompt)
        for _ in range(10):
            logits = np.asarray(
                M.decoder_forward(
                    params, jnp.asarray([seq], dtype=jnp.int32), enc_out, CFG
                )
            )[0, -1]
            if len(seq) <= 5:
                logits = logits + suppress
            tok = int(np.argmax(logits))
            seq.append(tok)
            if tok == EOT:
                break

        toks, lengths, _ = dgreedy.greedy_decode_jit(
            params,
            enc_out,
            jnp.asarray(prompt),
            CFG,
            eot_id=EOT,
            suppress_mask=_suppress_mask(),
            max_depth=10,
        )
        ours = list(np.asarray(toks)[0, : int(lengths[0])])
        assert ours == seq

    def test_batch_streams_independent(self, params):
        """B=3 batched greedy == 3 singleton runs (per-stream early stop)."""
        rng = np.random.default_rng(11)
        mels = rng.standard_normal(
            (3, 80, CFG.audio_encoder_config.n_audio_ctx)
        ).astype(np.float32)
        enc = M.encoder_forward(params, jnp.asarray(mels), CFG)
        prompt = np.array([3, 9, 11, 4], np.int32)

        toks_b, len_b, _ = dgreedy.greedy_decode_jit(
            params, enc, jnp.asarray(prompt), CFG, eot_id=EOT, max_depth=8
        )
        for i in range(3):
            toks_1, len_1, _ = dgreedy.greedy_decode_jit(
                params, enc[i : i + 1], jnp.asarray(prompt), CFG,
                eot_id=EOT, max_depth=8,
            )
            assert list(np.asarray(toks_b)[i, : int(len_b[i])]) == list(
                np.asarray(toks_1)[0, : int(len_1[0])]
            )


class TestBatchedBeam:
    def test_matches_unbatched(self, params):
        """vmapped beam over W windows == W independent searches."""
        rng = np.random.default_rng(21)
        mels = rng.standard_normal(
            (3, 80, CFG.audio_encoder_config.n_audio_ctx)
        ).astype(np.float32)
        encs = M.encoder_forward(params, jnp.asarray(mels), CFG)
        prompt = jnp.asarray([3, 9, 11, 4], jnp.int32)

        toks_b, len_b, logp_b = dbeam.beam_search_batched_jit(
            params, encs, prompt, CFG, eot_id=EOT,
            suppress_mask=_suppress_mask(), beam_size=3, max_depth=10,
        )
        for w in range(3):
            toks_1, len_1, logp_1 = dbeam.beam_search_jit(
                params, encs[w : w + 1], prompt, CFG, eot_id=EOT,
                suppress_mask=_suppress_mask(), beam_size=3, max_depth=10,
            )
            assert list(np.asarray(toks_b)[w, : int(len_b[w])]) == list(
                np.asarray(toks_1)[: int(len_1)]
            )
            np.testing.assert_allclose(float(logp_b[w]), float(logp_1), atol=1e-5)

    def test_differential_early_stop(self, params):
        """Windows that finish at DIFFERENT depths must freeze exactly like
        independent searches (the flat batched loop masks stopped windows
        instead of relying on vmap's carry select)."""
        rng = np.random.default_rng(33)
        # a randomly-initialized tiny decoder barely reacts to enc_out, so
        # amplify the cross-attention output path to make windows diverge
        blk = dict(params["decoder"]["blocks"])
        blk["cross_o_w"] = blk["cross_o_w"] * 100.0
        p2 = {**params, "decoder": {**params["decoder"], "blocks": blk}}
        encs = jnp.asarray(
            rng.standard_normal((4, 16, CFG.n_state)).astype(np.float32) * 10)
        prompt = jnp.asarray([3, 9], jnp.int32)

        # pick window 0's first greedy continuation as EOT: window 0 then
        # finishes immediately while the others run on
        from whisper_tpu.decode import greedy as dgreedy

        g_toks, g_len, _ = dgreedy.greedy_decode_jit(
            p2, encs, prompt, CFG, eot_id=-1, max_depth=1)
        eot = int(np.asarray(g_toks)[0, 2])

        toks_b, len_b, logp_b = dbeam.beam_search_batched(
            p2, encs, prompt, CFG, eot_id=eot, beam_size=3, max_depth=12)
        lengths = [int(x) for x in np.asarray(len_b)]
        assert len(set(lengths)) > 1, "test needs differential stopping"
        for w in range(4):
            toks_1, len_1, logp_1 = dbeam.beam_search(
                p2, encs[w : w + 1], prompt, CFG, eot_id=eot,
                beam_size=3, max_depth=12,
            )
            assert list(np.asarray(toks_b)[w, : lengths[w]]) == list(
                np.asarray(toks_1)[: int(len_1)]
            ), f"window {w}"
            np.testing.assert_allclose(
                float(logp_b[w]), float(logp_1), atol=1e-5)


class TestBeamPrimitives:
    """The beam step's perf-critical primitives (one-hot lane permute, the
    iterative exact top-k) must match their reference XLA equivalents
    exactly -- they are load-bearing for token-exact decode parity."""

    def test_permute_lanes_matches_take(self):
        # batch-major (B, L, C, d) self cache: lanes are axis 0
        x = jax.random.normal(jax.random.PRNGKey(0), (6, 3, 4, 8), jnp.bfloat16)
        for par in ([2, 2, 0, 5, 1, 3], [0, 0, 0, 0, 0, 0], [5, 4, 3, 2, 1, 0]):
            p = jnp.array(par, jnp.int32)
            assert jnp.array_equal(
                M.permute_lanes(x, p), jnp.take(x, p, axis=0)
            )

    def test_top_k_matches_lax(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((4, 101)).astype(np.float32))
        v1, i1 = dbeam._top_k(x, 5)
        v2, i2 = jax.lax.top_k(x, 5)
        assert jnp.allclose(v1, v2) and jnp.array_equal(i1, i2)

    def test_top_k_tie_order_matches_lax(self):
        # ties must resolve identically (lowest index first)
        x = jnp.asarray(
            np.array([[1.0, 3.0, 3.0, 0.5, 3.0, 2.0]], np.float32))
        v1, i1 = dbeam._top_k(x, 4)
        v2, i2 = jax.lax.top_k(x, 4)
        assert jnp.allclose(v1, v2) and jnp.array_equal(i1, i2)

    def test_top_k_with_neg_inf_rows(self):
        x = jnp.full((2, 9), -jnp.inf).at[0, 3].set(1.0)
        v1, i1 = dbeam._top_k(x, 3)
        v2, i2 = jax.lax.top_k(x, 3)
        assert jnp.array_equal(jnp.isinf(v1), jnp.isinf(v2))
        assert jnp.array_equal(v1[0, 0], v2[0, 0]) and i1[0, 0] == i2[0, 0]

    def test_two_level_top_k_matches_iterative(self):
        """The two-level segmented top-k (large-N path) is element-for-
        element identical to the iterative form, including tie-breaks and
        the -inf duplicate-0 quirk."""
        rng = np.random.default_rng(1)
        # large N, NOT a multiple of the 128 segment, duplicated values to
        # force cross-segment ties, plus -inf rows/tails
        n = 5 * 128 + 37
        x = rng.standard_normal((6, n)).astype(np.float32)
        x[:, 1::3] = x[:, 0::3][:, : len(x[0, 1::3])]  # many exact ties
        x[2] = -np.inf
        x[3, 10:] = -np.inf
        x[4, :200] = 7.0  # a 200-wide tie plateau spanning segments
        xj = jnp.asarray(x)
        v1, i1 = dbeam._top_k(xj, 5)
        v2, i2 = dbeam._top_k_iter(xj, 5)
        assert x.shape[-1] > 4 * 128  # the two-level path is actually taken
        assert jnp.array_equal(jnp.isneginf(v1), jnp.isneginf(v2))
        finite = ~np.isneginf(np.asarray(v1))
        assert np.array_equal(np.asarray(v1)[finite], np.asarray(v2)[finite])
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_two_level_top_k_segment_boundary_ties(self):
        """k-th value tied across included/excluded segments resolves to
        the lowest global index, exactly like lax.top_k."""
        x = np.zeros((1, 6 * 128), np.float32)
        # identical maxima in many segments; lowest-index elements must win
        for s in range(6):
            x[0, s * 128 + 7] = 5.0
        x[0, 300] = 9.0
        xj = jnp.asarray(x)
        v1, i1 = dbeam._top_k(xj, 4)
        v2, i2 = jax.lax.top_k(xj, 4)
        assert jnp.array_equal(v1, v2) and jnp.array_equal(i1, i2)
