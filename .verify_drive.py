import os
import numpy as np, jax, jax.numpy as jnp, dataclasses
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/whisper_tpu/xla"))
from whisper_tpu.config import preset
from whisper_tpu.ops.audio import prep_audio, max_waveform_samples
from whisper_tpu.models import whisper as M
from whisper_tpu.decode.greedy import greedy_decode_jit
from whisper_tpu.decode.beam import beam_search_jit

cfg = preset("tiny.en")
params = M.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
n = max_waveform_samples(cfg.encoder_ctx_size - 10)
wave = jnp.asarray(np.random.default_rng(0).standard_normal((2, n)).astype(np.float32))
mel = jax.jit(prep_audio)(wave)
prompt = jnp.array([50257, 50362], jnp.int32)
toks = {}
for name in ("flash", "xla"):
    c = dataclasses.replace(cfg, attention=name)
    enc = jax.jit(lambda p, m: M.encoder_forward(p, m, c))(params, mel)
    t, l, s = greedy_decode_jit(params, enc, prompt, c, eot_id=50256, max_depth=24)
    toks[name] = np.asarray(t)[:, :int(np.max(np.asarray(l)))]
assert np.array_equal(toks["flash"], toks["xla"]), "token mismatch"
c = dataclasses.replace(cfg, attention="flash")
enc1 = jax.jit(lambda p, m: M.encoder_forward(p, m, c))(params, mel[:1])
out = beam_search_jit(params, enc1, prompt, c, eot_id=50256, beam_size=5, max_depth=16)
# int8 self-KV + prefix permute must decode the same tokens on the chip
out_q = beam_search_jit(params, enc1, prompt, c, eot_id=50256, beam_size=5,
                        max_depth=16, kv_quant="int4", self_quant=True)
n = int(min(np.asarray(out[1])[0] if np.asarray(out[1]).ndim else out[1],
            np.asarray(out_q[1])[0] if np.asarray(out_q[1]).ndim else out_q[1]))
t0_, t1_ = np.asarray(out[0])[:n], np.asarray(out_q[0])[:n]
match = float((t0_ == t1_).mean())
print(f"beam int8-self token match vs bf16: {match:.3f} over {n} tokens")
assert match >= 0.9, (t0_, t1_)
print("greedy fused==general token-exact on chip; beam ok:", np.asarray(out[0])[:4])
print("VERIFY OK")
