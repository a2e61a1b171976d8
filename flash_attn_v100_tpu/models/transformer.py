"""Flagship model: a Llama-family decoder transformer built on the framework's
attention ops — pure-JAX param pytrees, no flax dependency.

Model families: the same block covers Llama/TinyLlama (baseline),
Mistral (`sliding_window` — lowered to the kernels' `window_size` left
window), and Qwen2 (`qkv_bias` — biased q/k/v projections).  Family
selection is pure config: `integrations.huggingface.convert_hf_model`
derives it from the checkpoint.

Role in the framework: what the reference validates through unsloth LoRA SFT
of llama-2-7b (reference: utils/benchmarks/benchmark_unsloth.py:50-190) — an
end-to-end model exercising the attention engine — is here a first-class
component: training forward/backward through `flash_attn_func`'s custom_vjp,
sequence-parallel prefill through `ring_attention`, and KV-cache decode
through `flash_attn_with_kvcache`.

Scaling model (TPU-first): the step function is plain jnp + attention calls;
under `jit` with a Mesh, GSPMD partitions the projections/MLP from the
parameter shardings (tensor parallel on "model", data parallel on "data"),
while attention — which XLA cannot partition through a Pallas call — goes
through the framework's shard_map wrappers (ring attention on "seq").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flash_attn_v100_tpu.ops.flash_attention import flash_attn_func
from flash_attn_v100_tpu.ops.kvcache import flash_attn_with_kvcache
from flash_attn_v100_tpu.ops.rotary import apply_rotary_emb
from flash_attn_v100_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS, MODEL_AXIS
from flash_attn_v100_tpu.parallel.ring import ring_attention


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    dim: int = 2048
    n_layers: int = 16
    n_heads: int = 16
    n_kv_heads: int = 8
    head_dim: int = 128
    ffn_dim: int = 5632
    rope_theta: float = 10000.0
    max_seq_len: int = 4096
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    dropout_p: float = 0.0
    # Mistral-family local attention: each token attends to the previous
    # `sliding_window` positions inclusive (HF semantics) -> kernel
    # window_size = (sliding_window - 1, 0 via causal).
    sliding_window: Optional[int] = None
    # Qwen2-family biased q/k/v projections.
    qkv_bias: bool = False

    def window_size(self) -> Tuple[int, int]:
        if self.sliding_window is None:
            return (-1, -1)
        return (self.sliding_window - 1, -1)

    @staticmethod
    def tiny(**kw) -> "ModelConfig":
        base = dict(vocab_size=256, dim=128, n_layers=2, n_heads=4,
                    n_kv_heads=2, head_dim=32, ffn_dim=256, max_seq_len=256,
                    dtype=jnp.float32)
        base.update(kw)
        return ModelConfig(**base)


def init_params(key, cfg: ModelConfig) -> Dict:
    """He-style init; all weights stored in cfg.dtype."""
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                * (fan_in ** -0.5)).astype(cfg.dtype)

    layers = []
    hd, hq, hk = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    for i in range(cfg.n_layers):
        ks = jax.random.split(keys[i], 7)
        layer = dict(
            wq=dense(ks[0], cfg.dim, (cfg.dim, hq * hd)),
            wk=dense(ks[1], cfg.dim, (cfg.dim, hk * hd)),
            wv=dense(ks[2], cfg.dim, (cfg.dim, hk * hd)),
            wo=dense(ks[3], hq * hd, (hq * hd, cfg.dim)),
            w1=dense(ks[4], cfg.dim, (cfg.dim, cfg.ffn_dim)),
            w3=dense(ks[5], cfg.dim, (cfg.dim, cfg.ffn_dim)),
            w2=dense(ks[6], cfg.ffn_dim, (cfg.ffn_dim, cfg.dim)),
            ln1=jnp.ones((cfg.dim,), cfg.dtype),
            ln2=jnp.ones((cfg.dim,), cfg.dtype),
        )
        if cfg.qkv_bias:
            layer.update(
                bq=jnp.zeros((hq * hd,), cfg.dtype),
                bk=jnp.zeros((hk * hd,), cfg.dtype),
                bv=jnp.zeros((hk * hd,), cfg.dtype),
            )
        layers.append(layer)
    return dict(
        embed=(jax.random.normal(keys[-2], (cfg.vocab_size, cfg.dim), jnp.float32)
               * 0.02).astype(cfg.dtype),
        layers=layers,
        ln_f=jnp.ones((cfg.dim,), cfg.dtype),
    )


def rope_tables(cfg: ModelConfig, seqlen: Optional[int] = None):
    seqlen = seqlen or cfg.max_seq_len
    half = cfg.head_dim // 2
    freqs = cfg.rope_theta ** (-np.arange(0, half) / half)
    ang = np.arange(seqlen)[:, None] * freqs[None, :]
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def rmsnorm(x, scale, eps=1e-5):
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * inv).astype(x.dtype) * scale


def qkv_proj(h, lp, cfg: ModelConfig, B: int, T: int):
    """Projections for one block; Qwen2-family checkpoints carry q/k/v biases."""
    q, k, v = h @ lp["wq"], h @ lp["wk"], h @ lp["wv"]
    if "bq" in lp:
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    return (q.reshape(B, T, cfg.n_heads, cfg.head_dim),
            k.reshape(B, T, cfg.n_kv_heads, cfg.head_dim),
            v.reshape(B, T, cfg.n_kv_heads, cfg.head_dim))


def _attention(q, k, v, cfg, mesh, rng_key, interpret):
    if mesh is not None and mesh.shape.get(SEQ_AXIS, 1) > 1:
        return ring_attention(q, k, v, mesh, causal=True,
                              window_size=cfg.window_size(),
                              interpret=interpret)
    return flash_attn_func(q, k, v, causal=True, dropout_p=cfg.dropout_p,
                           window_size=cfg.window_size(),
                           rng_key=rng_key, interpret=interpret)


def forward(params, tokens, cfg: ModelConfig, *,
            mesh: Optional[Mesh] = None,
            rng_key=None,
            interpret: Optional[bool] = None) -> jnp.ndarray:
    """tokens (B, S) int32 -> logits (B, S, vocab) fp32."""
    B, S = tokens.shape
    cos, sin = rope_tables(cfg, cfg.max_seq_len)
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]

    x = jnp.take(params["embed"], tokens, axis=0)
    if mesh is not None:
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None)))

    for i, lp in enumerate(params["layers"]):
        h = rmsnorm(x, lp["ln1"], cfg.norm_eps)
        q, k, v = qkv_proj(h, lp, cfg, B, S)
        q = apply_rotary_emb(q, cos, sin, pos, interleaved=False)
        k = apply_rotary_emb(k, cos, sin, pos, interleaved=False)
        key_i = None if rng_key is None else jax.random.fold_in(rng_key, i)
        attn = _attention(q, k, v, cfg, mesh, key_i, interpret)
        x = x + attn.reshape(B, S, -1) @ lp["wo"]
        h2 = rmsnorm(x, lp["ln2"], cfg.norm_eps)
        x = x + (jax.nn.silu(h2 @ lp["w1"]) * (h2 @ lp["w3"])) @ lp["w2"]
        if mesh is not None:
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None)))

    x = rmsnorm(x, params["ln_f"], cfg.norm_eps)
    # tied embeddings by default; HF checkpoints may carry a separate lm_head
    head = params.get("lm_head", None)
    head = params["embed"].T if head is None else head
    return (x @ head).astype(jnp.float32)


def loss_fn(params, tokens, cfg: ModelConfig, **kw) -> jnp.ndarray:
    """Next-token cross entropy (mean over B*(S-1) positions)."""
    logits = forward(params, tokens[:, :-1], cfg, **kw)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def sgd_train_step(params, tokens, cfg: ModelConfig, lr=1e-2, **kw):
    """One plain-SGD step; returns (loss, new_params).  Kept optimizer-free so
    the multichip dryrun has no optax dependency surface; real training uses
    `make_train_step` below."""
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, cfg, **kw)
    new = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return loss, new


def make_train_step(cfg: ModelConfig, optimizer=None, mesh: Optional[Mesh] = None,
                    interpret: Optional[bool] = None):
    """jitted (params, opt_state, tokens, rng) -> (loss, params, opt_state)."""
    import optax

    if optimizer is None:
        optimizer = optax.adamw(3e-4, weight_decay=0.01)

    def step(params, opt_state, tokens, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, tokens, cfg, mesh=mesh, rng_key=rng, interpret=interpret)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, opt_state

    return jax.jit(step, donate_argnums=(0, 1)), optimizer


def param_shardings(params, cfg: ModelConfig, mesh: Mesh):
    """Tensor-parallel placement: attention heads and ffn columns on "model".

    wq/wk/wv column-sharded (per-head), wo row-sharded (the psum after wo is
    inserted by GSPMD); w1/w3 column-, w2 row-sharded; norms/embed replicated.
    """
    def shard(spec):
        return NamedSharding(mesh, spec)

    def layer_spec(lp):
        spec = dict(
            wq=shard(P(None, MODEL_AXIS)), wk=shard(P(None, MODEL_AXIS)),
            wv=shard(P(None, MODEL_AXIS)), wo=shard(P(MODEL_AXIS, None)),
            w1=shard(P(None, MODEL_AXIS)), w3=shard(P(None, MODEL_AXIS)),
            w2=shard(P(MODEL_AXIS, None)),
            ln1=shard(P()), ln2=shard(P()),
        )
        if "bq" in lp:  # biases follow their column-sharded projections
            spec.update(bq=shard(P(MODEL_AXIS)), bk=shard(P(MODEL_AXIS)),
                        bv=shard(P(MODEL_AXIS)))
        return spec

    return dict(
        embed=shard(P()),
        layers=[layer_spec(lp) for lp in params["layers"]],
        ln_f=shard(P()),
    )


# ======================================================================================
# Decode path (serving)
# ======================================================================================

def init_kv_caches(cfg: ModelConfig, batch: int, max_len: int, dtype=None):
    """Per-layer HND contiguous caches (B, Hk, N, D) — the zero-copy layout."""
    dtype = dtype or cfg.dtype
    shape = (batch, cfg.n_kv_heads, max_len, cfg.head_dim)
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.n_layers)
    ]


def decode_step(params, caches, tokens, cache_seqlens, cfg: ModelConfig, *,
                interpret: Optional[bool] = None):
    """One decode step: tokens (B, T_new) -> (logits (B, T_new, vocab),
    new caches).  Rotary is fused into the kvcache op at the cache position
    (reference flow: kernel/fused_mha_forward_kvcache.cu phase A/B)."""
    B, T = tokens.shape
    cos, sin = rope_tables(cfg, cfg.max_seq_len)

    x = jnp.take(params["embed"], tokens, axis=0)
    new_caches = []
    for lp, (kc, vc) in zip(params["layers"], caches):
        h = rmsnorm(x, lp["ln1"], cfg.norm_eps)
        q, k, v = qkv_proj(h, lp, cfg, B, T)
        attn, (kc, vc) = flash_attn_with_kvcache(
            q, kc, vc, k=k, v=v, rotary_cos=cos, rotary_sin=sin,
            cache_seqlens=cache_seqlens, causal=True,
            window_size=cfg.window_size(),
            rotary_interleaved=False, kv_cache_layout="HND",
            interpret=interpret)
        new_caches.append((kc, vc))
        x = x + attn.reshape(B, T, -1) @ lp["wo"]
        h2 = rmsnorm(x, lp["ln2"], cfg.norm_eps)
        x = x + (jax.nn.silu(h2 @ lp["w1"]) * (h2 @ lp["w3"])) @ lp["w2"]

    x = rmsnorm(x, params["ln_f"], cfg.norm_eps)
    head = params.get("lm_head", None)
    head = params["embed"].T if head is None else head
    return (x @ head).astype(jnp.float32), new_caches
