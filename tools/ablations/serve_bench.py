"""Serving A/B: continuous window-pool batching vs one-shot grouped dispatch.

Drives BatchingWorker directly (no HTTP) with a staggered-arrival workload:
a front wave of multi-window requests immediately followed (after `STAGGER`
seconds) by a stream of short requests — the regime where the grouped
worker makes newcomers wait for the whole in-flight group while the
continuous worker admits them at the next window-batch boundary and keeps
batches full across request boundaries.

Run on the real chip:
  python tools/ablations/serve_bench.py [model] [continuous|grouped|both]

Reports per-request completion latency (p50/p95), makespan, and
requests/s for each mode. Random weights (real EOT never fires; max_depth
caps the decode) — an upper bound on decode work, identical across modes.
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/whisper_tpu/xla"))

import numpy as np  # noqa: E402

MODEL = sys.argv[1] if len(sys.argv) > 1 else "large-v2"
MODE = sys.argv[2] if len(sys.argv) > 2 else "both"
MAX_DEPTH = 48
BATCH = 8          # windows per decode batch
N_LONG = int(os.environ.get("SB_N_LONG", "8"))     # staggered requests
LONG_WINDOWS = int(os.environ.get("SB_WINDOWS", "3"))  # windows each
N_SHORT = int(os.environ.get("SB_N_SHORT", "4"))   # trailing 1-window reqs
STAGGER = float(os.environ.get("SB_STAGGER", "0.3"))  # s between arrivals


def build_worker(continuous: bool):
    import jax
    import jax.numpy as jnp  # noqa: F401

    from whisper_tpu.config import preset
    from whisper_tpu.models import whisper as M
    from whisper_tpu.pipeline.batch import BatchTranscriber
    from whisper_tpu.serve import BatchingWorker
    from whisper_tpu.text.tokenizer import (
        WhisperTokenizer, build_test_tokenizer_json)

    tok_path = "/tmp/serve_bench_tok.json"
    if not os.path.exists(tok_path):
        build_test_tokenizer_json(tok_path)
    tok = WhisperTokenizer(tok_path)
    cfg = preset(MODEL)
    import dataclasses
    cfg = dataclasses.replace(
        cfg,
        text_decoder_config=dataclasses.replace(
            cfg.text_decoder_config, n_vocab=tok.vocab_size),
        attention="flash" if jax.default_backend() == "tpu" else "xla",
    )
    params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    t = BatchTranscriber(params, cfg, tok, batch_size=BATCH)
    w = BatchingWorker(t, max_batch=BATCH, max_wait_s=0.05,
                       continuous=continuous)
    w.start()
    return w


def run_mode(continuous: bool):
    from whisper_tpu.ops.audio import max_waveform_samples
    from whisper_tpu.pipeline.transcribe import DecodeOptions  # noqa: F401
    from whisper_tpu import serve as serve_mod

    w = build_worker(continuous)
    n_window = max_waveform_samples(w.t.cfg.encoder_ctx_size - 10)

    def wave(n_windows, seed):
        n = n_windows * n_window  # exact: no sub-window tail
        return (np.random.default_rng(seed).standard_normal(n) * 0.2
                ).astype(np.float32)

    # cap decode depth: wrap the worker's option builder for the bench
    import dataclasses as dc
    base_opts = serve_mod.BatchingWorker._opts

    def patched_opts(req, DecodeOptions, lang=None):
        o = base_opts(req, DecodeOptions, lang)
        # overlap 0: every window is FULL (a nonzero overlap leaves every
        # request a sub-window tail that decodes through the sequential
        # single-window path in both modes, swamping the A/B)
        return dc.replace(o, max_depth=MAX_DEPTH,
                          chunk_overlap_seconds=0.0)
    serve_mod.BatchingWorker._opts = staticmethod(patched_opts)

    # warm compile: one request end to end before timing
    warm = serve_mod._Request(wave(1, 99), "en", True)
    w.q.put(warm)
    assert warm.done.wait(timeout=1200), "warmup timed out"
    assert warm.error is None, warm.error

    reqs = []
    lat = {}
    t0 = time.perf_counter()

    def submit(r, tag):
        reqs.append((tag, r, time.perf_counter()))
        w.q.put(r)

    # STAGGERED arrivals: each request lands while the previous one's
    # windows are still decoding -- the grouped worker fragments them into
    # per-drain groups (each group's last batch runs part-empty), the
    # continuous pool packs windows across request boundaries.
    def submitter():
        for i in range(N_LONG):
            submit(serve_mod._Request(wave(LONG_WINDOWS, i), "en", True),
                   f"long{i}")
            time.sleep(STAGGER)
        for i in range(N_SHORT):
            submit(serve_mod._Request(wave(1, 100 + i), "en", True),
                   f"short{i}")
            time.sleep(STAGGER)

    th = threading.Thread(target=submitter)
    th.start()
    th.join()
    # poll completions so each latency is stamped WHEN it finishes (a
    # sequential done.wait() loop would stamp early finishers late)
    deadline = time.perf_counter() + 1200
    while len(lat) < len(reqs):
        for tag, r, ts in reqs:
            if tag not in lat and r.done.is_set():
                assert r.error is None, (tag, r.error)
                lat[tag] = time.perf_counter() - ts
        assert time.perf_counter() < deadline, "requests timed out"
        time.sleep(0.002)
    makespan = time.perf_counter() - t0
    serve_mod.BatchingWorker._opts = base_opts

    allv = sorted(lat.values())
    shorts = sorted(v for k, v in lat.items() if k.startswith("short"))
    n = len(reqs)
    mode = "continuous" if continuous else "grouped"
    print(f"{mode}: makespan {makespan:.2f}s, {n / makespan:.2f} req/s | "
          f"latency p50 {allv[len(allv) // 2]:.2f}s "
          f"p95 {allv[int(len(allv) * 0.95) - 1]:.2f}s max {allv[-1]:.2f}s"
          + (f" | short p50 {shorts[len(shorts) // 2]:.2f}s"
             if shorts else ""), flush=True)
    return makespan


def main():
    if MODE in ("grouped", "both"):
        run_mode(False)
    if MODE in ("continuous", "both"):
        run_mode(True)


if __name__ == "__main__":
    main()
