"""Microbench: what the flash kernel's softmax actually costs on the VPU.

The round-4 decomposition left flash attention ~3.7 ms/layer at large-v2
b64 with ~1 ms of that being MXU GEMMs -- the rest is the rowwise softmax
over the (block_q, sk_pad) f32 score tile. This probes WHERE that time
goes by timing variant kernels (numerics intentionally wrong for the
ablated stages; timing only):

  full     baseline _attn_bsd_kernel semantics
  nomask   skip the padded-column where()
  noexp    exp(s - m) -> (s - m): removes the transcendental only
  nodiv    divide the (block_q, hd) OUTPUT by the row sums instead of the
           (block_q, sk_pad) probability tile -- a REAL candidate (saves a
           full-width VPU pass; changes bf16 rounding of p)
  nosoftmax  scores cast straight to bf16 and hit the second dot: the
           GEMM + copy floor

Run on the real chip: python tools/ablations/flash_softmax.py [batch]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.expanduser("~/.cache/whisper_tpu/xla"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H, S, HD = 20, 745, 64
BLOCK_Q = 768
GROUP = 2
NEG_INF = -1e30
REPS, CALLS = 4, 8


def kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len, variant):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    sk_pad = k.shape[0]
    block_q = q.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk_pad), 1)
    mask = col < kv_len
    outs = []
    for g in range(GROUP):
        qh = q[:, g * HD:(g + 1) * HD]
        kh = k[:, g * HD:(g + 1) * HD]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if variant != "nomask":
            s = jnp.where(mask, s, NEG_INF)
        if variant == "nosoftmax":
            p = s.astype(v.dtype)
            den = None
        else:
            m = jnp.max(s, axis=1, keepdims=True)
            e = (s - m) if variant == "noexp" else jnp.exp(s - m)
            den = jnp.sum(e, axis=1, keepdims=True)
            if variant == "nodiv":
                p = e.astype(v.dtype)
            else:
                p = (e / den).astype(v.dtype)
                den = None
        o = jax.lax.dot_general(
            p, v[:, g * HD:(g + 1) * HD],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if den is not None:
            o = o / den
        outs.append(o)
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def build(variant):
    d = H * HD
    sq_pad = ((S + BLOCK_Q - 1) // BLOCK_Q) * BLOCK_Q
    sk_pad = ((S + 7) // 8) * 8
    gd = GROUP * HD
    grid = (B, H // GROUP, sq_pad // BLOCK_Q)

    def one(q, k, v):
        return pl.pallas_call(
            functools.partial(kernel, kv_len=S, variant=variant),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, gd), lambda bi, hi, qi: (bi, qi, hi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk_pad, gd), lambda bi, hi, qi: (bi, 0, hi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk_pad, gd), lambda bi, hi, qi: (bi, 0, hi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, BLOCK_Q, gd), lambda bi, hi, qi: (bi, qi, hi),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, sq_pad, d), v.dtype),
        )(q, k, v)

    def run(q, k, v):
        o = q
        for _ in range(CALLS):
            o = one(o[:, :sq_pad] * 0 + q, k, v)  # serial dependency
        return o
    return jax.jit(run), sq_pad


def main():
    rng = np.random.default_rng(0)
    d = H * HD
    base = None
    for variant in ("full", "nomask", "noexp", "nodiv", "nosoftmax"):
        f, sq_pad = build(variant)
        q = jnp.asarray(rng.standard_normal((B, sq_pad, d)) * 0.1,
                        jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, ((S + 7) // 8) * 8, d)) * 0.1,
                        jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, ((S + 7) // 8) * 8, d)) * 0.1,
                        jnp.bfloat16)
        np.asarray(f(q, k, v)[0, :2, :2])  # compile
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            np.asarray(f(q, k, v)[0, :2, :2])
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1000 / CALLS
        if base is None:
            base = ms
        print(f"{variant:10s}: {ms:7.3f} ms/layer-call "
              f"(delta vs full {ms - base:+6.3f})", flush=True)


if __name__ == "__main__":
    main()
