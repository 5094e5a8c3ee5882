"""On-chip streaming latency probe: push-to-decode wall latency p50/p95.

Measures what the serving daemon's /stream endpoints deliver (serve.py,
pipeline/streaming.py): N concurrent StreamingTranscriber sessions share
ONE Transcriber (= one compiled window executable); audio arrives in
`--block` second blocks and each session decodes once `--step` seconds
have accumulated. The recorded latency is the wall time of a push() call
that triggered a decode -- the time a live caller waits for its updated
hypothesis -- under round-robin dispatch, which is how the HTTP daemon's
per-session locks serialize concurrent streams onto the single chip.

Weights are random (no checkpoint in this environment) and decodes run the
full timestamped greedy/beam loop to max_depth unless a random EOT lands --
an upper-bound work profile per decode, labeled as such; see bench.py's
note on the same convention.

Usage (on the TPU host):
    python tools/ablations/stream_latency.py [--model large-v2]
        [--sessions 1 2 4] [--audio-s 24] [--block 0.5] [--step 1.0]
        [--strategy greedy] [--max-depth 48]

Results are recorded in docs/PERFORMANCE.md ("Streaming latency").
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
    ap.add_argument("--sessions", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--audio-s", type=float, default=24.0)
    ap.add_argument("--block", type=float, default=0.5)
    ap.add_argument("--step", type=float, default=1.0)
    ap.add_argument("--strategy", default="greedy",
                    choices=["greedy", "beam"])
    ap.add_argument("--beam-size", type=int, default=5)
    ap.add_argument("--max-depth", type=int, default=48)
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (correctness shakeout; "
                    "latency numbers are meaningless off-chip)")
    ap.add_argument("--threaded", action="store_true",
                    help="drive each session from its own thread (the HTTP "
                    "daemon's model) instead of single-thread round-robin")
    ap.add_argument("--batched", action="store_true",
                    help="share a StreamDecodeBatcher: concurrent sessions' "
                    "decodes merge into one batched program (implies "
                    "--threaded)")
    ap.add_argument("--batch-wait", type=float, default=0.03,
                    help="batcher coalescing window (s)")
    ap.add_argument("--draft", default=None, metavar="PRESET",
                    help="speculative decoding (greedy only): attach a "
                    "synthetic draft model of this preset (e.g. tiny). "
                    "NOTE random-weight models tie-collapse onto the same "
                    "argmax, so this measures the ~FULL-acceptance latency "
                    "ceiling; spec_decode.py has the acceptance-controlled "
                    "curve")
    ap.add_argument("--draft-k", type=int, default=4)
    args = ap.parse_args()
    if args.batched:
        args.threaded = True

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
    from whisper_tpu.pipeline.streaming import StreamingTranscriber
    from whisper_tpu.pipeline.transcribe import DecodeOptions, Transcriber
    from whisper_tpu.text.tokenizer import (
        WhisperTokenizer, build_full_scale_tokenizer_json,
    )

    cfg = preset(args.model)
    print(f"# stream_latency: {args.model} strategy={args.strategy} "
          f"block={args.block}s step={args.step}s depth={args.max_depth} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if args.quant == "int8":
        from whisper_tpu.quantize import quantize_params

        params = quantize_params(params, bits=8)

    with tempfile.TemporaryDirectory() as td:
        tok_path = os.path.join(td, "tokenizer.json")
        build_full_scale_tokenizer_json(tok_path)
        tok = WhisperTokenizer(tok_path)
    if tok.vocab_size != cfg.text_decoder_config.n_vocab:
        raise SystemExit(
            f"full-scale tokenizer vocab {tok.vocab_size} != model "
            f"n_vocab {cfg.text_decoder_config.n_vocab}; pick a "
            "multilingual preset (tiny/base/small/medium/large*)"
        )

    draft = None
    if args.draft is not None:
        if args.batched or args.strategy != "greedy":
            raise SystemExit("--draft needs --strategy greedy, unbatched "
                             "(speculative decoding is the B=1 path)")
        dcfg = preset(args.draft)
        draft = (M.init_params(jax.random.PRNGKey(7), dcfg,
                               dtype=jnp.bfloat16), dcfg)
    if args.batched:
        from whisper_tpu.pipeline.batch import BatchTranscriber

        t = BatchTranscriber(params, cfg, tok,
                             batch_size=max(args.sessions))
    else:
        t = Transcriber(params, cfg, tok, draft=draft,
                        draft_k=args.draft_k)
    opts = DecodeOptions(
        strategy=args.strategy, beam_size=args.beam_size,
        max_depth=args.max_depth, kv_quant="int8", timestamps=True,
    )

    rng = np.random.default_rng(0)
    sr = 16000
    block_n = int(args.block * sr)
    n_blocks = int(args.audio_s / args.block)

    results = []
    for n_sessions in args.sessions:
        batcher = None
        if args.batched:
            from whisper_tpu.pipeline.streaming import StreamDecodeBatcher

            batcher = StreamDecodeBatcher(
                t, batch_size=n_sessions, max_wait_s=args.batch_wait)
        streams = [
            StreamingTranscriber(
                None, None, None, options=opts,
                min_step_seconds=args.step, transcriber=t,
                batcher=batcher,
            )
            for _ in range(n_sessions)
        ]
        # per-session independent audio so decode work is uncorrelated
        audio = [
            (rng.standard_normal(n_blocks * block_n).astype(np.float32)
             * 0.05)
            for _ in range(n_sessions)
        ]
        lat = []  # wall seconds of each decode-triggering push
        warm = True  # first decode compiles; drop it from the stats
        t_start = time.perf_counter()
        if args.threaded:
            # warm the executable once so compile time stays out of stats
            wst = StreamingTranscriber(
                None, None, None, options=opts, min_step_seconds=args.step,
                transcriber=t, batcher=batcher)
            t0 = time.perf_counter()
            wst.push(audio[0][: int(args.step * sr) + block_n])
            print(f"# warmup decode (may compile): "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            import threading

            lock = threading.Lock()
            t_start = time.perf_counter()

            def drive(s, a):
                for b in range(n_blocks):
                    t0 = time.perf_counter()
                    s.push(a[b * block_n: (b + 1) * block_n])
                    dt = time.perf_counter() - t0
                    if dt > 5e-3:
                        with lock:
                            lat.append(dt)
                s.finish()

            threads = [
                threading.Thread(target=drive, args=(s, a))
                for s, a in zip(streams, audio)
            ]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
        else:
            for b in range(n_blocks):
                for s, a in zip(streams, audio):
                    t0 = time.perf_counter()
                    s.push(a[b * block_n : (b + 1) * block_n])
                    dt = time.perf_counter() - t0
                    if dt > 5e-3:  # a decode ran (buffered pushes ~free)
                        if warm:
                            print(f"# warmup decode (may compile): "
                                  f"{dt:.1f}s", file=sys.stderr)
                            warm = False
                            t_start = time.perf_counter()  # aggregate xRT
                        else:                              # excl. warmup
                            lat.append(dt)
            for s in streams:
                s.finish()
        total = time.perf_counter() - t_start
        if batcher is not None:
            print(f"# batcher: {batcher.batches} calls / "
                  f"{batcher.batched_requests} decodes "
                  f"(avg group {batcher.batched_requests / max(batcher.batches, 1):.2f})",
                  file=sys.stderr)
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        p50 = float(np.percentile(lat_ms, 50))
        p95 = float(np.percentile(lat_ms, 95))
        # approximate (audio pushed before the warmup decode is excluded
        # from the clock but counted in the numerator)
        rt = n_sessions * args.audio_s / total
        results.append((n_sessions, p50, p95, len(lat), rt))
        print(f"# sessions={n_sessions}: decode latency p50={p50:.0f}ms "
              f"p95={p95:.0f}ms n={len(lat)} aggregate {rt:.1f}x RT",
              file=sys.stderr)

    print("sessions,p50_ms,p95_ms,n_decodes,aggregate_xrt")
    for n_sessions, p50, p95, n, rt in results:
        print(f"{n_sessions},{p50:.0f},{p95:.0f},{n},{rt:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
