"""On-chip speculative-decoding A/B: B=1 greedy window decode, plain loop
vs draft-verify blocks (decode/speculative.py), across CONTROLLED
acceptance rates.

Weights are random in this environment, so a real draft's natural
agreement is meaningless -- and NOT chance-level: random-init models
tie-collapse onto the same argmax and agree ~always (measured; see
make_hook). Instead both models decode under scripted logits hooks: at
each position, with probability p (hashed from the position, so
deterministic and shared), both hooks boost one predetermined
pseudo-random text token -- the draft proposes it, the target verifies
it; otherwise each hook boosts a model-salted token, a guaranteed
mismatch. Acceptance is exactly p by construction (the decoder's
`draft_logits_hook` parameter exists for this).
This measures the MECHANISM's speedup-vs-acceptance curve honestly; the
real-world operating point on that curve needs real checkpoints
(env-blocked, see PARITY.md "Known gaps"; published Whisper
speculative-decoding setups report ~70-95% acceptance on speech).

Both modes emit IDENTICAL tokens at each p (speculative greedy is exact);
the script asserts it per run on the chip -- which also exercises the S=1
fused-kernel vs S=k verify-path argmax agreement that the CPU parity tests
cannot see (CLAUDE.md: verify kernels numerically ON the chip).

Usage (on the TPU host):
    python tools/ablations/spec_decode.py [--model large-v2] [--draft tiny]
        [--depth 100] [--k 2 4 8] [--p 0 0.5 0.8 0.95] [--reps 3] [--cpu]

Results are recorded in docs/PERFORMANCE.md ("Speculative decoding").
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v2")
    ap.add_argument("--draft", default="tiny")
    ap.add_argument("--depth", type=int, default=100)
    ap.add_argument("--k", type=int, nargs="+", default=[2, 4, 8])
    ap.add_argument("--p", type=float, nargs="+",
                    default=[0.0, 0.5, 0.8, 0.95])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quant", default="int8", choices=["int8", "none"],
                    help="target weight quantization (draft stays bf16)")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU correctness shakeout (tiny shapes advised)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # the axon plugin force-registers and ignores JAX_PLATFORMS
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.path.expanduser("~/.cache/whisper_tpu/xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.config import preset
    from whisper_tpu.models import whisper as M
    from whisper_tpu.decode import greedy as dgreedy
    from whisper_tpu.decode import speculative as dspec
    from whisper_tpu.ops.audio import max_waveform_samples, prep_audio
    from whisper_tpu.text.tokenizer import (
        WhisperTokenizer, build_full_scale_tokenizer_json,
    )

    cfg = preset(args.model)
    dcfg = preset(args.draft)
    print(f"# spec_decode: {args.model} + draft {args.draft} "
          f"depth={args.depth} quant={args.quant} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    dparams = M.init_params(jax.random.PRNGKey(1), dcfg, dtype=jnp.bfloat16)
    if args.quant == "int8":
        from whisper_tpu.quantize import quantize_params

        params = quantize_params(params, bits=8)

    with tempfile.TemporaryDirectory() as td:
        tok_path = os.path.join(td, "tokenizer.json")
        build_full_scale_tokenizer_json(tok_path)
        tok = WhisperTokenizer(tok_path)
    V = cfg.text_decoder_config.n_vocab
    eot = tok.eot
    suppress = jnp.asarray(tok.suppress_mask())
    prompt = jnp.asarray(tok.prompt_ids("en"), jnp.int32)

    # one production window's encoder outputs, computed once (identical in
    # both modes; the draft encoder is the speculative path's only extra
    # encode work and is timed separately below)
    sr = 16000
    n_window = max_waveform_samples(cfg.encoder_ctx_size - 10)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal(n_window), jnp.float32)

    def run_encoder(p_, c_):
        mel = prep_audio(wave[None, :], n_mels=c_.n_mels)
        keep = min(mel.shape[2], c_.encoder_ctx_size - 10)
        mel = jnp.pad(mel[:, :, :keep], ((0, 0), (0, 0), (0, 10)))
        return jax.jit(lambda pp, mm: M.encoder_forward(pp, mm, c_))(p_, mel)

    t0 = time.perf_counter()
    enc = run_encoder(params, cfg)
    np.asarray(enc[:, 0, 0])
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    enc_d = run_encoder(dparams, dcfg)
    np.asarray(enc_d[:, 0, 0])
    t_enc_d = time.perf_counter() - t0
    print(f"# encoder: target {t_enc*1e3:.1f} ms (first call), "
          f"draft {t_enc_d*1e3:.1f} ms (speculative's extra encode)",
          file=sys.stderr)

    def make_hook(p_thresh, salt):
        """Scripted-agreement hook; p_thresh is TRACED (one program per
        mode, p swept at runtime). With probability p (hashed from the
        position, shared) both models' hooks boost the SAME pseudo-random
        text token -> the proposal verifies. Otherwise each boosts a
        salt-dependent token -> guaranteed mismatch, so acceptance == p
        exactly. (Without the salted miss branch, random-weight models
        tie-collapse onto the same argmax and measured acceptance is ~100%
        at every p -- the round-5 first-attempt trap.)"""

        def hook(x, tokens, seq_len):
            h = jnp.uint32(seq_len) * jnp.uint32(2654435761)
            scripted = (h % jnp.uint32(1000)).astype(jnp.float32) \
                < p_thresh * 1000.0
            tgt = jnp.uint32(seq_len) * jnp.uint32(40503) + jnp.uint32(17)
            miss = tgt + jnp.uint32(1 + salt)  # per-model, != shared token
            tok = 1000 + jnp.where(scripted, tgt, miss) % jnp.uint32(30000)
            boost = jnp.where(
                jnp.arange(V)[None, :] == tok.astype(jnp.int32), 3e4, 0.0)
            return x + boost

        return hook

    common = dict(eot_id=eot, suppress_mask=suppress,
                  max_depth=args.depth, kv_quant=True, self_quant=True)

    @jax.jit
    def greedy_fn(params, enc, prompt, pt):
        return dgreedy.greedy_decode(
            params, enc, prompt, cfg, logits_hook=make_hook(pt, 0), **common)

    spec_fns = {}
    for k in args.k:
        spec_fns[k] = jax.jit(
            lambda params, dparams, enc, enc_d, prompt, pt, _k=k:
            dspec.speculative_greedy_decode(
                params, enc, prompt, cfg, draft_params=dparams,
                draft_enc_out=enc_d, draft_cfg=dcfg, n_draft=_k,
                logits_hook=make_hook(pt, 0),
                draft_logits_hook=make_hook(pt, 1), **common))

    def timed(fn, *a):
        outs = fn(*a)
        toks = np.asarray(outs[0])  # forces completion (device->host)
        n = int(np.asarray(outs[1])[0])
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = fn(*a)
            np.asarray(outs[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return toks, n, best

    print(f"{'p':>5} {'mode':>8} {'s/decode':>9} {'new_tok':>8} "
          f"{'ms/tok':>7} {'speedup':>8} {'parity':>7}")
    P = int(prompt.shape[0])
    for p in args.p:
        pt = jnp.float32(p)
        g_toks, g_n, g_dt = timed(greedy_fn, params, enc, prompt, pt)
        print(f"{p:5.2f} {'greedy':>8} {g_dt:9.3f} {g_n - P:8d} "
              f"{g_dt / max(g_n - P, 1) * 1e3:7.2f} {'1.00x':>8} {'--':>7}")
        for k in args.k:
            s_toks, s_n, s_dt = timed(
                spec_fns[k], params, dparams, enc, enc_d, prompt, pt)
            mism = int(np.sum(g_toks[0, :g_n] != s_toks[0, :s_n])) \
                if g_n == s_n else -1
            parity = "ok" if (g_n == s_n and mism == 0) else \
                f"DIFF:{mism}"
            print(f"{p:5.2f} {'spec-k' + str(k):>8} {s_dt:9.3f} "
                  f"{s_n - P:8d} {s_dt / max(s_n - P, 1) * 1e3:7.2f} "
                  f"{g_dt / s_dt:7.2f}x {parity:>7}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
