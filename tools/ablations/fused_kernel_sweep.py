"""On-chip sweep of the fused beam kernel's time vs c_used (valid prefix).

Diagnoses what bounds decode_attention_permute_fused at bench shapes
(large-v2 beam: B=240, L=32, c=128, d=1280, K=5): if time scales ~linearly
with c_used the kernel is DMA/VPU-throughput-bound; if it is flat, the cost
is per-window issue/latency (serial small-op chains), and the fix is
batching lanes into bigger ops, not trimming traffic.

Run on the real chip: python tools/ablations/fused_kernel_sweep.py

Arg 1 (optional) selects the parents/stage regime for the read-dedup A/B:
  random-dedup   random in-window parents, dedup ON (default)
  random-nodedup same parents, stage=arange (every lane reads HBM itself)
  collapse-dedup all K lanes share one parent (beam collapse), dedup ON
  collapse-nodedup  collapse parents, dedup OFF
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/whisper_tpu/xla"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, L, C, D, K, NH = 240, 32, 128, 1280, 5, 20
REPS = 5


def main():
    from whisper_tpu.ops.pallas.permute_attention import (
        decode_attention_permute_fused,
    )

    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.integers(-127, 128, (B, L, C, D)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (B, L, C, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.05, (B, L, C)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.05, (B, L, C)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
    nk = jnp.asarray(rng.integers(-127, 128, (B, D)), jnp.int8)
    nv = jnp.asarray(rng.integers(-127, 128, (B, D)), jnp.int8)
    nks = jnp.asarray(rng.uniform(0.01, 0.05, (B,)), jnp.float32)
    nvs = jnp.asarray(rng.uniform(0.01, 0.05, (B,)), jnp.float32)
    mode = sys.argv[1] if len(sys.argv) > 1 else "random-dedup"
    regime, _, dedup = mode.partition("-")
    if regime == "collapse":
        # every lane in a window descends from the window's lane 0
        par_np = (np.arange(B) // K) * K * np.ones(B, np.int64)
    else:
        par_np = rng.integers(0, K, (B,)) + (np.arange(B) // K) * K
    parents = jnp.asarray(par_np, jnp.int32)
    if dedup == "nodedup":
        stage = jnp.arange(B, dtype=jnp.int32)
    else:
        stage = None  # kernel computes first-claimant stage from parents
    print(f"# mode={mode}: distinct parents/window ~"
          f"{np.mean([len(set(par_np[w*K:(w+1)*K])) for w in range(B//K)]):.2f}",
          flush=True)

    S = 8  # chained steps per jit call: amortizes the ~24 ms tunnel floor

    for cu in (32, 64, 96, 128):
        def step(q, kc, vc, ks, vs, cu=cu):
            def one_step(carry, _):
                def layer(carry, l):
                    kc, vc, ks, vs = carry
                    o, kc, vc, ks, vs = decode_attention_permute_fused(
                        q, kc, vc, ks, vs, nk, nv, nks, nvs, parents,
                        jnp.int32(cu - 1), l, NH, K, c_used=cu,
                        stage=stage)
                    return (kc, vc, ks, vs), o[0, :8]
                carry, os_ = jax.lax.scan(layer, carry, jnp.arange(L))
                return carry, os_[0]
            carry, os_ = jax.lax.scan(
                one_step, (kc, vc, ks, vs), None, length=S)
            # return the caches so the donated inputs can alias them (no
            # entry copy of the GB-scale operands)
            return os_, carry

        fn = jax.jit(step, donate_argnums=(1, 2, 3, 4))
        os_, (kc, vc, ks, vs) = fn(q, kc, vc, ks, vs)  # compile
        np.asarray(os_)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            os_, (kc, vc, ks, vs) = fn(q, kc, vc, ks, vs)
            np.asarray(os_)
            times.append(time.perf_counter() - t0)
        best = min(times) / S
        # bytes: reads cu rows/lane/layer k+v (+write-backs ~cu for movers)
        rd = B * cu * D * 2 * L / 1e9
        print(f"cu={cu:4d}: {best*1e3:7.2f} ms per 32-layer step "
              f"({best*1e3/L:5.3f} ms/layer; read {rd:.2f} GB "
              f"-> {rd/best:6.0f} GB/s effective-read)", flush=True)


if __name__ == "__main__":
    main()
