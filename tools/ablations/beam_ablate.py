"""Beam-step ablation. variants: full | nogather | fasttopk | both |
nobook (constant per-lane proposals: XLA dead-codes the remaining
full-vocab pass -- isolates the whole bookkeeping tail of the compressed
round-4 step)"""
import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))
import os, time, sys
import jax, jax.numpy as jnp, numpy as np, dataclasses, functools
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/whisper_tpu/xla"))
from whisper_tpu.config import preset
from whisper_tpu.models import whisper as M
from whisper_tpu.quantize import quantize_params
import whisper_tpu.decode.beam as BM

variant = sys.argv[1]
if variant in ("nogather", "both"):
    BM._cache_gather = lambda k, v, gp: (k, v)
if variant == "freshcopy":
    # fresh buffer per step, no permutation: isolates carry-churn cost
    BM._cache_gather = lambda k, v, gp: (
        k * jnp.asarray(1.0009765625, k.dtype),
        v * jnp.asarray(1.0009765625, v.dtype))
if variant == "xlatake":
    from whisper_tpu.models import whisper as MW
    BM._cache_gather = lambda k, v, gp: (
        MW.permute_lanes(k, gp), MW.permute_lanes(v, gp))
if variant == "nobook":
    # constant proposals: XLA dead-codes the full-vocab topk+lse pass
    BM._topk_lse = lambda x, k, seg=128: (
        jnp.zeros((*x.shape[:-1], k), x.dtype) - 1.0,
        jnp.zeros((*x.shape[:-1], k), jnp.int32),
        jnp.zeros(x.shape[:-1], x.dtype))
if variant in ("fasttopk", "both"):
    def fast_top_k(x, k):
        vals, idxs = [], []
        for _ in range(k):
            i = jnp.argmax(x, axis=-1)
            v = jnp.take_along_axis(x, i[..., None], -1)[..., 0]
            vals.append(v); idxs.append(i.astype(jnp.int32))
            x = jnp.where(
                jnp.arange(x.shape[-1]) == i[..., None], -jnp.inf, x)
        return jnp.stack(vals, -1), jnp.stack(idxs, -1)
    BM._top_k = fast_top_k

cfg = dataclasses.replace(preset("large-v2"), attention="flash")
params = quantize_params(M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
W = int(os.environ.get('W', '8'))
SA = int(os.environ.get('SA', '750'))
enc = jax.random.normal(jax.random.PRNGKey(1), (W, SA, cfg.n_state), jnp.bfloat16)
prompt = jnp.array([50258, 50259, 50359], jnp.int32)
fn = jax.jit(functools.partial(
    BM.beam_search_batched, cfg=cfg, eot_id=-1, beam_size=5, max_depth=100, kv_quant=os.environ.get('KV','int8'),
    self_quant=(os.environ.get('SQ') if os.environ.get('SQ') in ('int4',) else os.environ.get('SQ','0')=='1')))
t0 = time.perf_counter()
t, l, p = fn(params, enc, prompt); np.asarray(l)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
reps = []
for _ in range(3):
    t0 = time.perf_counter(); t, l, p = fn(params, enc, prompt); np.asarray(l)
    reps.append(time.perf_counter() - t0)
print(f"beam[{variant}]: reps={['%.3f'%r for r in reps]} -> {min(reps)*1000/100:.2f} ms/step")
