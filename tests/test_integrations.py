"""Integrations: LoRA SFT on the flagship model and HF-Llama checkpoint
import (logit parity vs transformers' torch implementation)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flash_attn_v100_tpu.models.transformer import (
    ModelConfig, init_params, forward)
from flash_attn_v100_tpu.integrations.lora import (
    LoraConfig, lora_init, lora_loss, make_lora_train_step, merge)


def test_lora_init_is_identity(rng):
    cfg = ModelConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(rank=4)
    lora = lora_init(jax.random.PRNGKey(1), params, lcfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)), jnp.int32)
    base = forward(params, toks, cfg)
    merged = forward(merge(params, lora, lcfg), toks, cfg)
    np.testing.assert_allclose(np.asarray(base), np.asarray(merged),
                               rtol=0, atol=1e-6)


def test_lora_training_reduces_loss(rng):
    cfg = ModelConfig.tiny(n_layers=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(rank=4, alpha=8.0)
    lora = lora_init(jax.random.PRNGKey(1), params, lcfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 33)), jnp.int32)
    step, opt = make_lora_train_step(cfg, lcfg)
    opt_state = opt.init(lora)
    key = jax.random.PRNGKey(2)
    first = None
    for i in range(8):
        loss, lora, opt_state = step(lora, opt_state, params, toks, key)
        first = first if first is not None else float(loss)
    assert float(loss) < first - 0.05, (first, float(loss))
    # base params untouched by construction (they're a frozen operand)


def test_lora_grads_flow_only_to_adapters(rng):
    cfg = ModelConfig.tiny(n_layers=1)
    params = init_params(jax.random.PRNGKey(0), cfg)
    lcfg = LoraConfig(rank=2, targets=("wq", "wv"))
    lora = lora_init(jax.random.PRNGKey(1), params, lcfg)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 17)), jnp.int32)
    g = jax.grad(lora_loss)(lora, params, toks, cfg, lcfg)
    # b starts at zero => dL/dA = 0 on the first step, dL/dB != 0
    gb = g["layers"][0]["wq"]["b"]
    assert float(jnp.abs(gb).max()) > 0


# ---- HF import parity ----

def _tiny_hf_llama():
    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")
    hf_cfg = tfs.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False)
    torch.manual_seed(0)
    with torch.no_grad():
        model = tfs.LlamaForCausalLM(hf_cfg).eval()
    return model, hf_cfg


def test_hf_llama_logit_parity(rng):
    torch = pytest.importorskip("torch")
    from flash_attn_v100_tpu.integrations.huggingface import convert_hf_llama
    model, hf_cfg = _tiny_hf_llama()
    params, cfg = convert_hf_llama(model, dtype=jnp.float32)
    assert cfg.n_kv_heads == 2 and cfg.norm_eps == 1e-6

    toks = rng.integers(0, hf_cfg.vocab_size, (2, 24))
    with torch.no_grad():
        ref = model(torch.asarray(np.asarray(toks))).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(toks, jnp.int32), cfg))
    # fp32 end-to-end on CPU interpret: tight tolerance
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_hf_llama_decode_parity(rng):
    """Greedy generation through the paged serving engine matches HF greedy."""
    torch = pytest.importorskip("torch")
    from flash_attn_v100_tpu.integrations.huggingface import convert_hf_llama
    from flash_attn_v100_tpu.runtime.engine import ServingEngine
    model, hf_cfg = _tiny_hf_llama()
    params, cfg = convert_hf_llama(model, dtype=jnp.float32)

    prompt = rng.integers(1, hf_cfg.vocab_size, (6,)).tolist()
    n_new = 6
    with torch.no_grad():
        out = model.generate(
            torch.asarray(np.asarray([prompt])), max_new_tokens=n_new,
            do_sample=False, use_cache=True, pad_token_id=0)
    ref = out[0, len(prompt):].tolist()

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=16, page_size=16)
    rid = eng.submit(prompt, max_new_tokens=n_new)
    res = eng.run_to_completion()
    assert res[rid] == ref, (res[rid], ref)


# ---- HF model families: Mistral (sliding window), Qwen2 (qkv bias) ----

def _tiny_hf_mistral():
    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")
    # sliding_window=8 << seqlen so the local-attention mask actually bites
    hf_cfg = tfs.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, rope_theta=10000.0,
        sliding_window=8, tie_word_embeddings=False)
    torch.manual_seed(1)
    with torch.no_grad():
        model = tfs.MistralForCausalLM(hf_cfg).eval()
    return model, hf_cfg


def test_hf_mistral_logit_parity(rng):
    """Sliding-window checkpoints lower to the kernels' window_size path."""
    torch = pytest.importorskip("torch")
    from flash_attn_v100_tpu.integrations.huggingface import convert_hf_model
    model, hf_cfg = _tiny_hf_mistral()
    params, cfg = convert_hf_model(model, dtype=jnp.float32)
    assert cfg.sliding_window == 8 and not cfg.qkv_bias
    assert cfg.window_size() == (7, -1)

    toks = rng.integers(0, hf_cfg.vocab_size, (2, 24))
    with torch.no_grad():
        ref = model(torch.asarray(np.asarray(toks))).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(toks, jnp.int32), cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_hf_mistral_engine_decode_parity(rng):
    """Greedy decode through the paged engine applies the sliding window to
    cached context (context longer than the window)."""
    torch = pytest.importorskip("torch")
    from flash_attn_v100_tpu.integrations.huggingface import convert_hf_model
    from flash_attn_v100_tpu.runtime.engine import ServingEngine
    model, hf_cfg = _tiny_hf_mistral()
    params, cfg = convert_hf_model(model, dtype=jnp.float32)

    prompt = rng.integers(1, hf_cfg.vocab_size, (12,)).tolist()  # > window
    n_new = 6
    with torch.no_grad():
        out = model.generate(
            torch.asarray(np.asarray([prompt])), max_new_tokens=n_new,
            do_sample=False, use_cache=True, pad_token_id=0)
    ref = out[0, len(prompt):].tolist()

    eng = ServingEngine(params, cfg, max_batch=2, num_pages=16, page_size=16)
    rid = eng.submit(prompt, max_new_tokens=n_new)
    res = eng.run_to_completion()
    assert res[rid] == ref, (res[rid], ref)


def test_hf_qwen2_logit_parity(rng):
    """Biased q/k/v projections import and match HF logits."""
    torch = pytest.importorskip("torch")
    tfs = pytest.importorskip("transformers")
    from flash_attn_v100_tpu.integrations.huggingface import convert_hf_model
    hf_cfg = tfs.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6,
        tie_word_embeddings=False)
    torch.manual_seed(2)
    with torch.no_grad():
        model = tfs.Qwen2ForCausalLM(hf_cfg).eval()
        # zero-init HF bias: randomize so the parity test actually covers it
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0.0, 0.5)
    params, cfg = convert_hf_model(model, dtype=jnp.float32)
    assert cfg.qkv_bias and cfg.sliding_window is None
    assert "bq" in params["layers"][0]

    toks = rng.integers(0, hf_cfg.vocab_size, (2, 24))
    with torch.no_grad():
        ref = model(torch.asarray(np.asarray(toks))).logits.float().numpy()
    got = np.asarray(forward(params, jnp.asarray(toks, jnp.int32), cfg))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


# ---- torch interop (integrations/torch_interop.py) ----

def test_torch_interop_forward_matches_sdpa(rng):
    torch = pytest.importorskip("torch")
    from flash_attn_v100_tpu.integrations.torch_interop import (
        flash_attn_func_torch)
    B, M, H, D = 2, 64, 4, 32
    q = torch.randn(B, M, H, D, dtype=torch.float32)
    k = torch.randn(B, M, H, D, dtype=torch.float32)
    v = torch.randn(B, M, H, D, dtype=torch.float32)
    out = flash_attn_func_torch(q, k, v, causal=True)
    assert isinstance(out, torch.Tensor) and out.shape == q.shape
    ref = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
        is_causal=True).transpose(1, 2)
    assert float((out - ref).abs().max()) < 2e-2


def test_torch_interop_noncontiguous_and_kvcache(rng):
    torch = pytest.importorskip("torch")
    from flash_attn_v100_tpu.integrations.torch_interop import (
        flash_attn_with_kvcache_torch)
    B, N, Hq, Hk, D = 2, 128, 4, 2, 32
    q = torch.randn(B, 1, Hq, D)
    # non-contiguous cache (transposed view) must be handled by the adapter
    kc = torch.randn(B, Hk, N, D).transpose(1, 2)
    vc = torch.randn(B, Hk, N, D).transpose(1, 2)
    cs = torch.full((B,), 100, dtype=torch.int32)
    out = flash_attn_with_kvcache_torch(q, kc, vc, cache_seqlens=cs,
                                        causal=True)
    from flash_attn_v100_tpu import flash_attn_with_kvcache
    ref = flash_attn_with_kvcache(
        jnp.asarray(q.numpy()), jnp.asarray(kc.contiguous().numpy()),
        jnp.asarray(vc.contiguous().numpy()),
        cache_seqlens=jnp.asarray(cs.numpy()), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_torch_autograd_fn_grads_match_torch_sdpa(rng):
    torch = pytest.importorskip("torch")
    from flash_attn_v100_tpu.integrations.torch_interop import (
        make_torch_autograd_fn)
    B, M, H, D = 1, 48, 2, 16
    q0 = torch.randn(B, M, H, D, dtype=torch.float32)
    k0 = torch.randn(B, M, H, D, dtype=torch.float32)
    v0 = torch.randn(B, M, H, D, dtype=torch.float32)

    fa = make_torch_autograd_fn(causal=True)
    q1, k1, v1 = (t.clone().requires_grad_(True) for t in (q0, k0, v0))
    fa(q1, k1, v1).square().sum().backward()

    q2, k2, v2 = (t.clone().requires_grad_(True) for t in (q0, k0, v0))
    torch.nn.functional.scaled_dot_product_attention(
        q2.transpose(1, 2), k2.transpose(1, 2), v2.transpose(1, 2),
        is_causal=True).transpose(1, 2).square().sum().backward()

    for a, b in ((q1, q2), (k1, k2), (v1, v2)):
        assert float((a.grad - b.grad).abs().max()) < 5e-2, \
            float((a.grad - b.grad).abs().max())


def test_flash_attn_dist_info_masquerade():
    """Ecosystem detection: `importlib.metadata.version("flash-attn")` must
    resolve to 2.8.3 — HF `is_flash_attn_2_available` probes package
    METADATA, not the import (reference: setup.py:114-124 fabricates the
    dist-info at install; here the repo root ships one and
    utils/distinfo.py regenerates it)."""
    import importlib.metadata
    import os
    import sys

    from flash_attn_v100_tpu.utils.distinfo import write_dist_info

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    write_dist_info(repo_root)          # idempotent; ships in-tree anyway
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    importlib.metadata.MetadataPathFinder.invalidate_caches()
    assert importlib.metadata.version("flash-attn") == "2.8.3"

    import flash_attn
    assert flash_attn.__version__ == "2.8.3"
