"""Training step: causal-LM fine-tune (full or LoRA) under pjit.

The reference trains with HF Trainer on one GPU (fp16, paged_adamw_8bit,
`modal_finetune_base.py:130-156`). Here the step is a pure jitted function
over the mesh: dp shards the batch, tp shards the weights; gradients are
psum'd by XLA through the sharded matmuls. LoRA mode differentiates only the
adapter tree (the 4-bit-base + adapter analog without the quant dance).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from tts_inference_tpu.config import ModelConfig
from tts_inference_tpu.models import llama
from tts_inference_tpu.training import lora as lora_lib


def lm_loss(
    params: Dict,
    model_cfg: ModelConfig,
    tokens: jnp.ndarray,     # (B, S)
    lens: jnp.ndarray,       # (B,)
) -> jnp.ndarray:
    """Next-token cross entropy with length masking.

    Uses the same forward as inference (a fresh zero cache doubles as the
    training attention buffer — one code path, no train/serve divergence).
    """
    b, s = tokens.shape
    cache = llama.init_kv_cache(model_cfg, b, s)
    hidden, _ = llama.forward(
        params, model_cfg, tokens, cache,
        jnp.zeros((b,), jnp.int32), lens,
    )
    logits = llama.compute_logits(params, model_cfg, hidden[:, :-1])
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (jnp.arange(s - 1)[None, :] + 1) < lens[:, None]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


@dataclasses.dataclass
class TrainState:
    params: Dict                 # trainable tree (full params, or LoRA tree)
    opt_state: optax.OptState
    step: jnp.ndarray


def make_train_step(
    model_cfg: ModelConfig,
    optimizer: optax.GradientTransformation,
    *,
    base_params: Optional[Dict] = None,
    lora_scale: float = 2.0,
):
    """Returns train_step(state, tokens, lens) -> (state, loss).

    With base_params set, `state.params` is a LoRA tree merged into the
    frozen base each step (grads flow only into A/B).
    """

    def loss_fn(trainable, tokens, lens):
        if base_params is not None:
            params = lora_lib.merge_params(base_params, trainable, lora_scale)
        else:
            params = trainable
        return lm_loss(params, model_cfg, tokens, lens)

    def train_step(state: TrainState, tokens, lens):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, tokens, lens
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def init_train_state(
    trainable: Dict, optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=trainable,
        opt_state=optimizer.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


jax.tree_util.register_dataclass(
    TrainState, data_fields=("params", "opt_state", "step"), meta_fields=()
)
