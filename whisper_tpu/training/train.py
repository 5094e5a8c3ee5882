"""Training: teacher-forced fine-tuning of Whisper on (mel, token) pairs.

New capability beyond the reference (which is inference-only -- "no training"
per SURVEY.md TL;DR); included because a production framework must close the
loop from checkpoints back to checkpoints. TPU-native through and through:

  * pure functional loss over the same forward functions the inference path
    uses (one model definition, no train/infer divergence);
  * optax AdamW; gradients via `jax.value_and_grad` under `jit`;
  * parallelism by construction: put params on a ("dp","tp") mesh with
    `parallel.sharding.shard_params`, shard the batch over "dp", and the
    jitted step runs Megatron-style TP + DP with XLA-inserted collectives --
    no hand-written communication;
  * optional rematerialization (`jax.checkpoint`) of each transformer block
    to trade FLOPs for HBM on long-audio batches.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import WhisperConfig
from ..models import whisper as M

Params = Dict[str, Any]


class TrainState(NamedTuple):
    step: jax.Array
    params: Params
    opt_state: Any


class Batch(NamedTuple):
    """One training batch.

    mel: (B, n_mels, T) log-mel features (T <= n_audio_ctx)
    tokens: (B, S) int32 -- full sequences [prompt..., text..., EOT, pad...]
    loss_mask: (B, S) f32 -- 1 where the NEXT-token prediction is scored
        (i.e. mask[i, t] scores the prediction of tokens[i, t+1]; the last
        column is ignored). Prompt and padding positions get 0.
    """

    mel: jax.Array
    tokens: jax.Array
    loss_mask: jax.Array


def cross_entropy_loss(
    params: Params, batch: Batch, cfg: WhisperConfig, remat: bool = False
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Mean next-token cross entropy over masked positions."""
    logits = M.whisper_forward(params, batch.mel, batch.tokens, cfg, remat=remat)
    logits = logits[:, :-1]  # predict token t+1 from position t
    targets = batch.tokens[:, 1:]
    mask = batch.loss_mask[:, :-1].astype(jnp.float32)

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (nll * mask).sum() / denom

    acc = ((jnp.argmax(logits, -1) == targets) * mask).sum() / denom
    return loss, {"loss": loss, "accuracy": acc, "tokens": mask.sum()}


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1)
    )
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def init_train_state(
    params: Params, optimizer: optax.GradientTransformation
) -> TrainState:
    """Build a TrainState; opt-state leaves inherit the params' sharding."""
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_train_step(
    cfg: WhisperConfig,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
):
    """Jitted (state, batch) -> (state, metrics) step.

    Sharding is data-driven: place `state` with `shard_params` (+ optimizer
    init) and `batch` with the dp sharding, and GSPMD partitions the step --
    TP collectives inside each block, gradient all-reduce over dp.
    """

    @jax.jit
    def train_step(state: TrainState, batch: Batch):
        (loss, metrics), grads = jax.value_and_grad(
            cross_entropy_loss, has_aux=True
        )(state.params, batch, cfg, remat)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return TrainState(state.step + 1, params, opt_state), metrics

    return train_step


def make_eval_step(cfg: WhisperConfig):
    @jax.jit
    def eval_step(params: Params, batch: Batch):
        _, metrics = cross_entropy_loss(params, batch, cfg)
        return metrics

    return eval_step
