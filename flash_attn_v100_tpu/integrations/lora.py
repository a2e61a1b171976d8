"""LoRA fine-tuning on the flagship model.

Covers the reference's end-to-end training validation — unsloth LoRA SFT of
llama-2-7b through the attention kernels (reference:
utils/benchmarks/benchmark_unsloth.py:50-190) — as a native component:
adapters on the attention (and optionally MLP) projections, gradients flowing
through flash_attn_func's custom_vjp backward kernels, base weights frozen.

Design: adapters live in a separate pytree (`lora`), the base `params` stay
untouched; `materialize(params, lora)` returns effective weights
W + (alpha/r)·A·B for the wrapped matrices.  Materializing costs one rank-r
GEMM pair per matrix per step and lets every downstream consumer (forward,
ring attention, decode) run unchanged — idiomatic for XLA, which fuses the
add into the consumer matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.models.transformer import ModelConfig, loss_fn

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 8
    alpha: float = 16.0
    targets: Sequence[str] = DEFAULT_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def lora_init(key, params, lcfg: LoraConfig) -> Dict:
    """A ~ N(0, 1/r) fp32, B = 0 — standard LoRA init (adapters start as a
    no-op)."""
    layers = []
    for lp in params["layers"]:
        ad = {}
        for name in lcfg.targets:
            key, sub = jax.random.split(key)
            fan_in, fan_out = lp[name].shape
            ad[name] = dict(
                a=jax.random.normal(sub, (fan_in, lcfg.rank), jnp.float32)
                * (lcfg.rank ** -0.5),
                b=jnp.zeros((lcfg.rank, fan_out), jnp.float32),
            )
        layers.append(ad)
    return dict(layers=layers)


def materialize(params, lora, lcfg: LoraConfig):
    """Effective params: W_eff = W + scale * A @ B (same dtype as W)."""
    out_layers = []
    for lp, ad in zip(params["layers"], lora["layers"]):
        new = dict(lp)
        for name, w in ad.items():
            delta = (w["a"] @ w["b"]) * lcfg.scale
            new[name] = lp[name] + delta.astype(lp[name].dtype)
        out_layers.append(new)
    out = dict(params)
    out["layers"] = out_layers
    return out


def merge(params, lora, lcfg: LoraConfig):
    """Bake adapters into the base weights (inference export)."""
    return materialize(params, lora, lcfg)


def lora_loss(lora, params, tokens, cfg: ModelConfig, lcfg: LoraConfig, **kw):
    return loss_fn(materialize(params, lora, lcfg), tokens, cfg, **kw)


def make_lora_train_step(cfg: ModelConfig, lcfg: LoraConfig, optimizer=None,
                         **fwd_kw) -> Tuple[Any, Any]:
    """jitted (lora, opt_state, params, tokens, rng) ->
    (loss, lora, opt_state).  Only adapters are optimized/donated; base
    params are a frozen operand."""
    import optax

    if optimizer is None:
        optimizer = optax.adamw(2e-4, weight_decay=0.0)

    def step(lora, opt_state, params, tokens, rng):
        loss, grads = jax.value_and_grad(lora_loss)(
            lora, params, tokens, cfg, lcfg, rng_key=rng, **fwd_kw)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return loss, lora, opt_state

    return jax.jit(step, donate_argnums=(0, 1)), optimizer
