"""On-chip streaming latency benchmark (docs/PERFORMANCE.md "Streaming").

Measures push-to-confirmed latency for StreamingTranscriber sessions on the
real TPU: synthetic 16 kHz audio is pushed in real-time-sized blocks, and for
each confirmed segment the latency is (wall time at confirmation) - (wall
time when the last sample of that segment was pushed). Reports p50/p95 per
concurrency level (1..N sessions interleaved round-robin, sharing ONE
Transcriber / compiled window executable, exactly like serve.py's sessions).

Random weights: this measures the serving-path latency mechanics (decode
cadence, fixed-shape executable reuse), not transcription quality.

Usage: python tools/stream_latency.py [model] [max_sessions] [seconds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/whisper_tpu/xla"),
)

import jax.numpy as jnp  # noqa: E402

from whisper_tpu.config import preset  # noqa: E402
from whisper_tpu.models import whisper as M  # noqa: E402
from whisper_tpu.pipeline.streaming import StreamingTranscriber  # noqa: E402
from whisper_tpu.pipeline.transcribe import DecodeOptions, Transcriber  # noqa: E402
from whisper_tpu.text.tokenizer import (  # noqa: E402
    WhisperTokenizer,
    build_full_scale_tokenizer_json,
)


def main() -> int:
    model = sys.argv[1] if len(sys.argv) > 1 else "tiny.en"
    max_sessions = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    stream_s = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0

    tok_path = "/tmp/wtpu_full_tokenizer.json"
    if not os.path.exists(tok_path):
        build_full_scale_tokenizer_json(tok_path)
    tok = WhisperTokenizer(tok_path)
    cfg = preset(model)
    params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    t = Transcriber(params, cfg, tok, dtype=jnp.bfloat16)
    opts = DecodeOptions(lang="en", strategy="greedy", max_depth=32)

    rng = np.random.default_rng(0)
    block_s = 0.25  # 250 ms push blocks, the realistic mic cadence
    block = int(16000 * block_s)
    n_blocks = int(stream_s / block_s)

    for n_sessions in range(1, max_sessions + 1):
        sessions = [
            StreamingTranscriber(None, None, None, options=opts, transcriber=t)
            for _ in range(n_sessions)
        ]
        # last push time per (session, segment-end-time) is approximated by
        # the push wall-time of the block containing the segment's end
        push_t = [dict() for _ in range(n_sessions)]  # end_block -> wall
        lat = []
        audio = [
            (rng.standard_normal(n_blocks * block) * 0.1).astype(np.float32)
            for _ in range(n_sessions)
        ]
        t_start = time.perf_counter()
        for b in range(n_blocks):
            for s in range(n_sessions):
                blk = audio[s][b * block: (b + 1) * block]
                t_push = time.perf_counter()
                push_t[s][b] = t_push
                confirmed = sessions[s].push(blk)
                t_done = time.perf_counter()
                for seg in confirmed:
                    # block whose audio contains the segment's end
                    eb = min(int(seg.end / block_s), b)
                    lat.append(t_done - push_t[s][eb])
        wall = time.perf_counter() - t_start
        rt = n_sessions * n_blocks * block_s / wall
        if lat:
            lat_ms = np.asarray(sorted(lat)) * 1000
            p50 = float(np.percentile(lat_ms, 50))
            p95 = float(np.percentile(lat_ms, 95))
            print(f"sessions={n_sessions}: {len(lat)} confirmations, "
                  f"p50={p50:.0f}ms p95={p95:.0f}ms "
                  f"aggregate={rt:.1f}x RT (wall {wall:.1f}s)")
        else:
            print(f"sessions={n_sessions}: no confirmations "
                  f"(random weights), aggregate={rt:.1f}x RT")
    return 0


if __name__ == "__main__":
    sys.exit(main())
