"""Per-op encoder decomposition at bench shapes (large-v2, b64, S=745).

Times each encoder-block component with an on-device lax.scan loop (R
sequential applications chained through the carry -- the axon tunnel has a
~24 ms round-trip floor, so single-call timings are meaningless). Each
iteration reduces the op output to a scalar folded into the carry to keep
the op live; the `baseline` row measures that harness overhead (reduce +
carry) alone, subtract it mentally from every row.

Usage: B=64 R=20 python tools/ablations/enc_decomp.py
"""
import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..', '..'))
import os, time
import jax, jax.numpy as jnp, numpy as np, dataclasses, functools
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/whisper_tpu/xla"))
from whisper_tpu.config import preset
from whisper_tpu.models import whisper as M

cfg = dataclasses.replace(preset("large-v2"), attention="flash")
ecfg = cfg.audio_encoder_config
d, nh, eps = cfg.n_state, ecfg.n_audio_head, cfg.ln_eps
B = int(os.environ.get("B", "64"))
S = int(os.environ.get("S", "745"))
R = int(os.environ.get("R", "20"))
H = 4 * d

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, S, d)).astype(np.float32) * 0.05,
                jnp.bfloat16)
p = {k: jnp.asarray(v.astype(np.float32) * s, jnp.bfloat16) for k, v, s in [
    ("qkv_w", rng.standard_normal((d, 3, d)), 0.02),
    ("qkv_b", rng.standard_normal((3, d)), 0.02),
    ("attn_o_w", rng.standard_normal((d, d)), 0.02),
    ("attn_o_b", rng.standard_normal((d,)), 0.02),
    ("mlp1_w", rng.standard_normal((d, H)), 0.02),
    ("mlp1_b", rng.standard_normal((H,)), 0.02),
    ("mlp2_w", rng.standard_normal((H, d)), 0.02),
    ("mlp2_b", rng.standard_normal((d,)), 0.02),
    ("ln_g", np.ones((d,)), 1.0),
    ("ln_b", np.zeros((d,)), 1.0),
]}


def ln(p, x):
    return M.layer_norm(x, p["ln_g"], p["ln_b"], eps)


def qkv(p, x):
    q, k, v = M._qkv_proj(x, p["qkv_w"], p["qkv_b"])
    return q + k + v  # keep all three live


def attn(p, x):
    from whisper_tpu.ops.pallas.flash_attention import attention_bhsd
    return attention_bhsd(x, x, x, nh)


def attn_xla(p, x):
    return M.qkv_attention(x, x, x, nh)


def oproj(p, x):
    return M._linear(x, p["attn_o_w"], p["attn_o_b"])


def mlp1(p, x):
    return M._linear(x, p["mlp1_w"], p["mlp1_b"])


def gelu_mlp1(p, x):
    return jax.nn.gelu(M._linear(x, p["mlp1_w"], p["mlp1_b"]),
                       approximate=False)


def mlp_full(p, x):
    h = jax.nn.gelu(M._linear(ln(p, x), p["mlp1_w"], p["mlp1_b"]),
                    approximate=False)
    return x + M._linear(h, p["mlp2_w"], p["mlp2_b"])


def mlp_fused(p, x):
    from whisper_tpu.ops.pallas.encoder_block import fused_mlp_block
    return fused_mlp_block(
        x, p["ln_g"], p["ln_b"], p["mlp1_w"], p["mlp1_b"], p["mlp2_w"],
        p["mlp2_b"], eps=eps,
        block_m=int(os.environ.get("BM", "1024")),
        block_h=int(os.environ.get("BH", "512")))


def attn_block(p, x):
    h = ln(p, x)
    q, k, v = M._qkv_proj(h, p["qkv_w"], p["qkv_b"])
    return x + oproj(p, M._attention(q, k, v, nh, "flash"))


def full_block(p, x):
    bp = {"attn_ln_g": p["ln_g"], "attn_ln_b": p["ln_b"],
          "mlp_ln_g": p["ln_g"], "mlp_ln_b": p["ln_b"], **p}
    return M._encoder_block(x, bp, nh, eps, "flash")


def baseline(p, x):
    return x


def timed(name, op):
    @jax.jit
    def run(p, x):
        def body(c, _):
            y = op(p, c)
            s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-12)
            return c + s.astype(c.dtype), None
        c, _ = jax.lax.scan(body, x, None, length=R)
        return c

    t0 = time.perf_counter()
    np.asarray(run(p, x)[0, 0, :1])
    compile_s = time.perf_counter() - t0
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(p, x)[0, 0, :1])
        reps.append(time.perf_counter() - t0)
    print(f"{name:12s}: {min(reps)*1000/R:8.2f} ms/iter  "
          f"(compile {compile_s:.1f}s)", flush=True)


names = os.environ.get(
    "OPS", "baseline,ln,qkv,attn,attn_xla,oproj,mlp1,gelu_mlp1,mlp_full,"
    "attn_block,full_block").split(",")
for nm in names:
    timed(nm, globals()[nm])
