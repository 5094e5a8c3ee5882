"""Decode-step decomposition probe: per-component time at beam/greedy shapes.

Times each component of the fused decode step in isolation, each as an
on-device chained loop (one jit, N iterations) so the axon tunnel's ~24 ms
round-trip floor is amortized away (CLAUDE.md measurement notes):

  self32   -- 32 chained self-attention kernel calls (the per-step kernel
              work of one decode step's self path)
  cross32  -- 32 chained cross-attention kernel calls (grouped kv_rep path
              when REP>1)
  permute  -- the beam reshuffle DMA permute (valid-prefix, int8 + scales)
  logits   -- final-ln + tied-embedding GEMM + log_softmax + two-level top-k
              (the beam bookkeeping tail)
  step     -- the full fused decoder step (everything but beam bookkeeping)

Compare `step` against the sum of its parts: the gap is launch/scheduling
overhead XLA cannot hide between custom calls. Env: W (windows), K (beam,
1 = greedy shapes), C (cache len), SELFQ (1 = int8 self-KV + scales),
KV (int8|int4|bf16 cross), N (chain length).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/whisper_tpu/xla"),
)

import dataclasses
import functools

from whisper_tpu.config import preset
from whisper_tpu.models import whisper as M
from whisper_tpu.ops.pallas.decode_attention import decode_attention_stacked
from whisper_tpu.ops.pallas.permute import permute_lanes_arrays
from whisper_tpu.quantize import QTensor, quantize_params
import whisper_tpu.decode.beam as BM

cfg = dataclasses.replace(preset("large-v2"), attention="flash")
W = int(os.environ.get("W", "24"))
K = int(os.environ.get("K", "5"))
C = int(os.environ.get("C", "128"))
N = int(os.environ.get("N", "20"))
SELFQ = os.environ.get("SELFQ", "1") == "1"
KV = os.environ.get("KV", "int4")
B = W * K
L, SA, D, NH = (cfg.text_decoder_config.n_text_layer, 750,
                cfg.n_state, cfg.text_decoder_config.n_text_head)
V = cfg.text_decoder_config.n_vocab
POS = int(os.environ.get("POS", str(C // 2)))

print(f"# step_decomp: W={W} K={K} B={B} C={C} pos={POS} selfq={SELFQ} "
      f"kv={KV} N={N} device={jax.devices()[0].device_kind}",
      file=sys.stderr)

rng = np.random.default_rng(0)
kvdt = {"int8": jnp.int8, "int4": jnp.int4, "bf16": jnp.bfloat16}[KV]
def _ri(shape):
    return rng.integers(-7, 8, shape, dtype=np.int8)


# int4 arrays cannot cross a jit boundary on axon (device_put recursion,
# CLAUDE.md); keep the host copies int8 and cast INSIDE the jitted chains.
# The cast is loop-invariant (hoisted out of the fori_loop), so it adds
# ~1/N of one cast per measured call -- noted, not corrected.
ck8 = jnp.asarray(_ri((L, W, SA, D)))
cv8 = jnp.asarray(_ri((L, W, SA, D)))
sdt = jnp.int8 if SELFQ else jnp.bfloat16
sk = jnp.asarray(_ri((B, L, C, D))).astype(sdt)
sv = jnp.asarray(_ri((B, L, C, D))).astype(sdt)
ks = jnp.asarray(rng.random((B, L, C)), jnp.float32)
vs = jnp.asarray(rng.random((B, L, C)), jnp.float32)
q0 = jnp.asarray(rng.standard_normal((B, D)), jnp.bfloat16)
pos_self = jnp.full((B,), POS, jnp.int32)
pos_cross = jnp.full((B,), SA - 1, jnp.int32)
parents = jnp.asarray(rng.integers(0, K, (B,)) + (np.arange(B) // K) * K,
                      jnp.int32)

params = quantize_params(
    M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))


def chain(f, *args):
    """f chained N times on-device (fori_loop: compile once, not N copies);
    returns min wall seconds per call."""
    def run(*a):
        return jax.lax.fori_loop(0, N, lambda _, o: f(*o), a)
    jf = jax.jit(run)
    r = jf(*args)
    np.asarray(jax.tree.leaves(r)[0]).ravel()[:2]
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = jf(*args)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:2]
        reps.append(time.perf_counter() - t0)
    return min(reps) / N


# Layer loops are fori_loop with a TRACED layer index -- ONE kernel
# lowering per program, exactly like the production scan (32 unrolled
# pallas_calls made Mosaic compile 32 copies through the tunnel: >18 min).
def self32(q):
    def body(i, q):
        o = decode_attention_stacked(
            q, sk, sv, pos_self, i, NH, batch_major=True,
            **(dict(k_rowscale=ks, v_rowscale=vs) if SELFQ else {}),
        )
        return (q + o.astype(q.dtype) * jnp.bfloat16(1e-3))[:, :D]
    return (jax.lax.fori_loop(0, L, body, q),)


def cross32(q):
    rep = B // W
    ck, cv = ck8.astype(kvdt), cv8.astype(kvdt)

    def body(i, q):
        o = decode_attention_stacked(
            q, ck, cv, pos_cross, i, NH, kv_rep=rep)
        return (q + o.astype(q.dtype) * jnp.bfloat16(1e-3))[:, :D]
    return (jax.lax.fori_loop(0, L, body, q),)


def permute1(k, v, kss, vss):
    o = permute_lanes_arrays((k, kss, v, vss), parents,
                             valid_len=jnp.int32(POS))
    return o[0], o[2], o[1], o[3]


def logits_tail(x, logp):
    dec = params["decoder"]
    h = M.layer_norm(x[:, None, :], dec["ln_g"], dec["ln_b"], cfg.ln_eps)
    lg = jax.lax.dot_general(
        h, dec["tok_emb"], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[:, 0]
    lp = jax.nn.log_softmax(lg, axis=-1).reshape(W, K, V)
    cand = (logp[:, :, None] + lp).reshape(W, K * V)
    nl, fi = BM._top_k(cand, K)
    x = x + nl.reshape(-1)[:B, None].astype(x.dtype) * jnp.bfloat16(1e-6)
    return x, nl


def full_step(tok, pos, k, v, kss, vss):
    if KV == "bf16":
        ck, cv = ck8.astype(jnp.bfloat16), cv8.astype(jnp.bfloat16)
    else:  # quantized cross-KV rides a QTensor with per-(L, d) scales
        one = jnp.ones((L, D), jnp.float32)
        ck = QTensor(ck8.astype(kvdt), one)
        cv = QTensor(cv8.astype(kvdt), one)
    cache = M.DecoderCache(
        QTensor(k, kss) if SELFQ else k,
        QTensor(v, vss) if SELFQ else v,
        ck, cv)
    lg, cache2 = M.decoder_step(params, tok, pos, cache, cfg)
    nk = cache2.self_k.q if SELFQ else cache2.self_k
    nv = cache2.self_v.q if SELFQ else cache2.self_v
    nks = cache2.self_k.scale if SELFQ else kss
    nvs = cache2.self_v.scale if SELFQ else vss
    return tok, (pos + 1) % (C - 1), nk, nv, nks, nvs


x0 = q0
tok0 = jnp.asarray(rng.integers(0, V, (B, 1)), jnp.int32)
logp0 = jnp.asarray(rng.standard_normal((W, K)), jnp.float32)

# ONLY=<name>[,<name>...] runs a subset -- each component is one jitted
# program and first compiles are tunnel-slow (>10 min for the kernel
# chains), so run components in separate invocations: every completed
# compile lands in the persistent cache and survives a timeout.
only = os.environ.get("ONLY", "self,cross,permute,logits,step").split(",")

results = {}
if "self" in only:
    results["self32"] = chain(self32, x0) * 1e3
    print(f"self32:  {results['self32']:7.3f} ms", flush=True)
if "cross" in only:
    results["cross32"] = chain(cross32, x0) * 1e3
    print(f"cross32: {results['cross32']:7.3f} ms", flush=True)
if "permute" in only:
    if SELFQ:
        t_perm = chain(permute1, sk, sv, ks, vs) * 1e3
    else:
        t_perm = chain(
            lambda k, v: permute_lanes_arrays((k, v), parents,
                                              valid_len=jnp.int32(POS)),
            sk, sv) * 1e3
    results["permute"] = t_perm
    print(f"permute: {t_perm:7.3f} ms", flush=True)
if "logits" in only:
    results["logits"] = chain(logits_tail, x0, logp0) * 1e3
    print(f"logits+topk: {results['logits']:7.3f} ms", flush=True)
if "step" in only:
    results["step"] = chain(
        full_step, tok0, jnp.int32(POS), sk, sv, ks, vs) * 1e3
    print(f"full fused step: {results['step']:7.3f} ms", flush=True)
if {"self32", "cross32", "logits"} <= set(results):
    print(f"sum(parts incl. neither qkv/mlp GEMMs): "
          f"{results['self32'] + results['cross32'] + results['logits']:7.3f}"
          f" ms")
