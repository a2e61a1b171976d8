"""Continuous-batching paged serving engine.

The host loop the reference's decode path points at but never ships (its
`block_table` + stubbed `num_splits`, kernel/fused_mha_forward_kvcache.cu:462):
requests arrive with arbitrary prompts, the native Scheduler
(csrc/fa_runtime.cpp) packs them into a fixed-shape decode batch under a paged
KV budget, and every running sequence advances one token per `step()`.

TPU-first design decisions:
  * ONE page pool per layer, stacked into a single (L, Hk, P, ps, D) array so
    the whole engine state is two jit arguments (k, v), donated every step —
    the appends stay in-place on device.
  * Fixed shapes everywhere: the decode batch is padded to `max_batch`
    (inactive rows point at a scratch page with length 0), prompts are padded
    to power-of-two buckets — so there is a small, bounded set of compiled
    programs.
  * Prefill and decode share one model body (prefill: T=bucket,
    cache_seqlens=0; decode: T=1, cache_seqlens=cur_len); both run the paged
    kvcache attention with fused rotary, causal.
  * seq x model meshes shard BOTH bandwidth and memory: heads on "model",
    page pools on "seq" with a sharded allocator handing out shard-local
    page ids per block-table slot range — per-chip HBM is one pool while
    total KV capacity is seq_shards x num_pages.
  * The decode loop NEVER touches the device synchronously: sampling runs
    inside the single jitted step, emitted tokens stay device-resident
    (lazy (array, row) entries, fetched in one batched transfer when a
    request finishes or re-prefills), the next step's input gathers the
    previous step's token array on device, cache_seqlens increments on
    device, and the block table is cached while the batch is steady.  On a
    host link with real latency this is the difference between
    latency-bound and compute-bound serving (measured 12x tokens/s and
    18x p50 TTFT on the dev tunnel).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_v100_tpu.models.transformer import (
    ModelConfig, qkv_proj, rmsnorm, rope_tables)
from flash_attn_v100_tpu.ops.kvcache import flash_attn_with_kvcache
from flash_attn_v100_tpu.runtime.scheduler import Scheduler


def paged_forward(params, k_pool, v_pool, tokens, cache_seqlens, block_table,
                  cfg: ModelConfig, *, k_scales=None, v_scales=None,
                  mesh=None, interpret: Optional[bool] = None):
    """tokens (B, T) -> (logits (B, T, vocab) fp32, k_pool, v_pool
    [, k_scales, v_scales]).

    k_pool/v_pool: (Hk, P_f, ps, D) page pools in HND layout with the
    LAYER axis FOLDED into the page axis — page p of layer l lives at
    folded id p * n_layers + l, so each layer's attention addresses the
    ONE donated pool through an offset block table (`tbl * L + l`) and
    its append scatters in place.  The previous (L, Hk, P, ps, D) layout
    forced a per-layer slice -> kernel -> set-back around the Pallas call,
    which XLA cannot alias away: the compiled decode step accessed
    20.4 GiB vs the ~8 GiB it needs (r5 cost-analysis,
    benchmarks/prof_decode_attrib.py).  Folding keeps page-axis sharding
    semantics intact (all layers of a page colocate in one contiguous
    chunk, so the sharded allocator's slot-column math is unchanged).

    block_table (B, max_pages) holds UNFOLDED page ids.  Appends the T
    new tokens of every row at its cache_seqlens position and runs causal
    paged attention with fused rotary (reference flow:
    kernel/fused_mha_forward_kvcache.cu phases A-C).  With int8/fp8 pools
    pass (Hk, P_f, ps, 1) fp32 scale pools: appended tokens quantize on
    the fly, the kernel dequantizes in-tile."""
    B, T = tokens.shape
    L = cfg.n_layers
    quantized = k_scales is not None
    cos, sin = rope_tables(cfg, cfg.max_seq_len)
    x = jnp.take(params["embed"], tokens, axis=0)

    def attn_step(q, kp, vp, k, v, tbl, *scales):
        ksc, vsc = scales if quantized else (None, None)
        return flash_attn_with_kvcache(
            q, kp, vp, k=k, v=v,
            rotary_cos=cos, rotary_sin=sin, cache_seqlens=cache_seqlens,
            block_table=tbl, causal=True, rotary_interleaved=False,
            window_size=cfg.window_size(),
            k_scales=ksc, v_scales=vsc,
            kv_cache_layout="HND", interpret=interpret)

    seq_sharded = False
    if mesh is not None:
        from flash_attn_v100_tpu.parallel.mesh import SEQ_AXIS
        seq_sharded = dict(mesh.shape).get(SEQ_AXIS, 1) > 1
    if seq_sharded:
        # seq x model mesh: pages shard over "seq" (each chip streams 1/sp of
        # every sequence's KV — the bandwidth-sharded long-context mode),
        # heads over "model"; partials combine via the cross-chip LSE merge
        from flash_attn_v100_tpu.parallel.sharded import (
            flash_attn_with_kvcache_sharded)

        def attn_step(q, kp, vp, k, v, tbl, *scales):
            ksc, vsc = scales if quantized else (None, None)
            res = flash_attn_with_kvcache_sharded(
                q, kp, vp, mesh, cache_seqlens, k=k, v=v,
                rotary_cos=cos, rotary_sin=sin, block_table=tbl,
                k_scales=ksc, v_scales=vsc, causal=True,
                window_size=cfg.window_size(),
                rotary_interleaved=False, interpret=interpret)
            return res
    elif mesh is not None:
        # tensor-parallel decode: projections are column/row-sharded on
        # "model" (GSPMD); the attention itself — a Pallas call XLA cannot
        # partition — runs under shard_map with heads AND their pool pages
        # sharded identically on "model", so each chip decodes its local
        # heads with zero collectives (the psum after wo is GSPMD's).
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from flash_attn_v100_tpu.parallel.mesh import MODEL_AXIS
        head = P(None, None, MODEL_AXIS, None)
        pool = P(MODEL_AXIS, None, None, None)
        cache_specs = (pool, pool) + ((pool, pool) if quantized else ())
        attn_step = shard_map(
            attn_step, mesh=mesh,
            in_specs=(head, pool, pool, head, head, P()) + (
                (pool, pool) if quantized else ()),
            out_specs=(head, cache_specs),
            check_vma=False)

    for li, lp in enumerate(params["layers"]):
        h = rmsnorm(x, lp["ln1"], cfg.norm_eps)
        q, k, v = qkv_proj(h, lp, cfg, B, T)
        tbl_l = block_table * L + li     # folded page ids of this layer
        if quantized:
            attn, (k_pool, v_pool, k_scales, v_scales) = attn_step(
                q, k_pool, v_pool, k, v, tbl_l, k_scales, v_scales)
        else:
            attn, (k_pool, v_pool) = attn_step(q, k_pool, v_pool, k, v, tbl_l)
        x = x + attn.reshape(B, T, -1) @ lp["wo"]
        h2 = rmsnorm(x, lp["ln2"], cfg.norm_eps)
        x = x + (jax.nn.silu(h2 @ lp["w1"]) * (h2 @ lp["w3"])) @ lp["w2"]
    x = rmsnorm(x, params["ln_f"], cfg.norm_eps)
    head = params.get("lm_head", None)
    head = params["embed"].T if head is None else head
    logits = (x @ head).astype(jnp.float32)
    if quantized:
        return logits, k_pool, v_pool, k_scales, v_scales
    return logits, k_pool, v_pool


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling controls (vLLM-style surface).

    temperature <= 0 means greedy; top_k == 0 means no top-k cut;
    top_p == 1.0 means no nucleus cut.  All three compose (top-k first,
    then top-p over the renormalized survivors)."""
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0


def _sample_rows(logits, key, temp, topk, topp):
    """Per-row sampling of (B, V) fp32 logits entirely on device: rows with
    temp <= 0 take argmax; others sample from the temperature-scaled
    distribution restricted to the top-k / top-p (nucleus) sets.

    The (B, V) argsort the top-k/top-p machinery needs is NOT free at real
    vocab sizes, so an all-greedy batch (the common serving default) takes
    a `lax.cond` branch that runs only the argmax."""
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sampled_branch(args):
        logits, key, temp, topk, topp = args
        V = logits.shape[-1]
        t = jnp.maximum(temp, 1e-6)[:, None]
        x = logits / t
        sort_idx = jnp.argsort(-x, axis=-1)           # descending
        x_sorted = jnp.take_along_axis(x, sort_idx, axis=-1)
        probs = jax.nn.softmax(x_sorted, axis=-1)
        ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
        keep = ranks < jnp.where(topk[:, None] > 0, topk[:, None], V)
        cum = jnp.cumsum(probs, axis=-1)
        # nucleus: keep tokens until cumulative prob first exceeds top_p
        keep &= (cum - probs) < topp[:, None]
        x_sorted = jnp.where(keep, x_sorted, -jnp.inf)
        samp_sorted = jax.random.categorical(key, x_sorted, axis=-1)
        sampled = jnp.take_along_axis(
            sort_idx, samp_sorted[:, None], axis=-1)[:, 0].astype(jnp.int32)
        return jnp.where(temp <= 0.0, greedy_tok, sampled)

    return jax.lax.cond(
        jnp.all(temp <= 0.0),
        lambda args: greedy_tok,
        sampled_branch,
        (logits, key, temp, topk, topp))


@dataclasses.dataclass
class _Seq:
    """`generated` entries are ints once materialized, or lazy
    (device_token_array, row) pairs — the engine never blocks the decode
    loop on a device->host fetch (over a remote-tunnel link that fetch
    dominates step latency); values are pulled only when a sequence
    finishes, is re-prefilled after preemption, or `result()` is called."""
    id: int
    prompt: List[int]
    max_new_tokens: int
    generated: List[Any] = dataclasses.field(default_factory=list)
    submitted_at: float = 0.0
    first_token_at: Optional[float] = None
    done: bool = False
    sampling: Optional["SamplingParams"] = None
    on_token: Optional[Any] = None    # callback(rid, new_tokens: List[int])
    streamed: int = 0                 # tokens already delivered to on_token
    # prefix cache bookkeeping: chain hashes of the prompt's FULL pages
    # (page j's hash covers tokens [0, (j+1)*page_size)), and whether this
    # sequence's pages currently hold committed prefill KV (False between
    # a preemption and its re-prefill)
    page_hashes: List[int] = dataclasses.field(default_factory=list)
    prefilled: bool = False
    # chunked-prefill progress: tokens already appended to the cache, the
    # page ids that hold them (continuation is valid only while these are
    # unchanged — preemption reallocates them), and the step counter value
    # of the last chunk (a gap in steps means the sequence left the batch,
    # i.e. was preempted, so committed KV must be assumed lost)
    prefill_committed: int = 0
    chunk_page_ids: List[int] = dataclasses.field(default_factory=list)
    last_chunk_step: int = -1


class ServingEngine:
    """Continuous-batching decode over one model replica.

    >>> eng = ServingEngine(params, cfg, max_batch=8, num_pages=256)
    >>> rid = eng.submit([1, 2, 3], max_new_tokens=16)
    >>> while not eng.idle():
    ...     finished = eng.step()
    """

    def __init__(self, params, cfg: ModelConfig, *, max_batch: int = 8,
                 num_pages: int = 256, page_size: int = 16,
                 greedy: bool = True, temperature: float = 1.0,
                 rng_seed: int = 0, use_native: bool = True,
                 mesh=None, kv_dtype=None,
                 eos_token_id: Optional[int] = None,
                 eos_check_interval: int = 8,
                 prefix_cache: bool = True,
                 prefill_chunk: Optional[int] = None,
                 max_prefill_seqs: Optional[int] = None,
                 decode_fuse: int = 8,
                 interpret: Optional[bool] = None):
        """`mesh`: a jax.sharding.Mesh for tensor-parallel decode — KV heads
        and their page pools shard over the "model" axis; `params` must
        already be placed with `models.transformer.param_shardings`.
        `kv_dtype`: jnp.int8 / jnp.float8_e4m3fn / "int4" for a quantized
        page pool (1/2 / 1/2 / 1/4 the HBM per token; appended KV quantizes
        on the fly; "int4" packs two TOKENS per byte along the page axis).
        `eos_token_id`: stop sequences at this token; checked every
        `eos_check_interval` steps with one batched device fetch, so a
        sequence may run up to interval-1 tokens past its EOS before being
        reaped (its output is still truncated exactly at the EOS).
        `prefix_cache`: page-granular shared-prompt reuse — a new request
        whose prompt prefix (in whole pages) matches a LIVE request's
        committed prompt pages device-copies that KV into its own pages and
        prefills only the suffix.  Compute reuse with storage duplication:
        the page copy (~100 us/0.5k tokens) replaces the prefix's prefill
        FLOPs (~ms) without refcounting pages across sequences, so the
        scheduler/allocator and preemption semantics are untouched.
        `prefill_chunk`: cap on prompt tokens prefilled per sequence per
        step (None = whole prompt in one step).  A long prompt then spans
        several steps — decode rows keep advancing every step and compiled
        prefill shapes stop growing with prompt length, at the cost of the
        chunked request's own TTFT.  Power-of-two chunks avoid re-bucketing.
        `decode_fuse`: when the running batch is STEADY (same rows, no page
        allocation or token-budget exhaustion possible within the window),
        up to this many decode steps run inside ONE jitted `lax.scan`
        dispatch — the host loop, scheduler, and dispatch overhead amortize
        over the window (fused widths are powers of two, so at most
        log2(decode_fuse) extra compiles).  Sampling keys fold the same
        per-step counter the unfused loop uses, so token streams are
        IDENTICAL to decode_fuse=1.  EOS reaping still happens every
        `eos_check_interval` ENGINE steps, so a sequence may overrun its EOS
        by up to interval * decode_fuse tokens before being reaped (output
        is still truncated exactly at the EOS).  1 disables fusion."""
        if cfg.max_seq_len % page_size:
            raise ValueError("page_size must divide cfg.max_seq_len")
        # Cross-host serving: when `mesh` spans processes the engine runs
        # SPMD — every process executes the SAME host loop (submit/step
        # calls must be replicated deterministically, which they are: the
        # scheduler, bucketing, and RNG are pure functions of the request
        # sequence), device state lives in global arrays over the hybrid
        # mesh, and sampled tokens come back replicated so every process
        # can fetch them locally.  This is the "continuous batching of
        # decode requests across hosts" the reference's stubbed num_splits
        # points at (kernel/fused_mha_forward_kvcache.cu:462).
        self.multiprocess = mesh is not None and jax.process_count() > 1
        self._rep_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            self._rep_sharding = NamedSharding(mesh, PartitionSpec())
        if prefill_chunk is not None and prefill_chunk < 1:
            raise ValueError("prefill_chunk must be positive")
        self.prefill_chunk = prefill_chunk
        # staggered admission: at most this many sequences prefill per step
        # (the rest stay queued, flagged needs_prefill again next step) — a
        # burst of long prompts emits first tokens incrementally instead of
        # all at the end of one giant batched prefill.  Mid-chunk
        # continuations bypass the cap (deferring them reads as preemption
        # and would restart their chunks).
        if max_prefill_seqs is not None and max_prefill_seqs < 1:
            raise ValueError("max_prefill_seqs must be positive")
        self.max_prefill_seqs = max_prefill_seqs
        self.params = params
        self.cfg = cfg
        self.page_size = page_size
        self.max_batch = max_batch
        self.mesh = mesh
        self.max_pages_per_seq = cfg.max_seq_len // page_size
        kv_dtype = kv_dtype or cfg.dtype
        from flash_attn_v100_tpu.ops.quant import is_int4
        self.kv_int4 = is_int4(kv_dtype)
        self.quantized = self.kv_int4 or kv_dtype in (jnp.int8,
                                                      jnp.float8_e4m3fn)
        sp = 1
        if mesh is not None:
            from flash_attn_v100_tpu.parallel.mesh import SEQ_AXIS
            sp = dict(mesh.shape).get(SEQ_AXIS, 1)
        self.seq_shards = sp
        if sp > 1 and self.max_pages_per_seq % sp:
            raise ValueError(
                f"max_seq_len/page_size = {self.max_pages_per_seq} pages per "
                f"sequence must divide the seq axis ({sp})")
        # one scratch page (local id 0) backs inactive batch rows; the
        # scheduler hands out pages 1..num_pages.  seq x model mesh: the
        # allocator is SHARDED — block-table slot columns are contiguously
        # sharded on "seq", slot j allocates from the pool shard of the chip
        # owning that column, and num_pages is PER SHARD — so per-chip memory
        # is one (num_pages + 1)-page pool while total KV capacity is
        # sp * num_pages pages, and each chip streams only 1/sp of every
        # sequence's KV per decode step.
        self.sched = Scheduler(max_batch, num_pages, page_size,
                               use_native=use_native, num_shards=sp,
                               slots_per_shard=self.max_pages_per_seq // sp
                               if sp > 1 else 2**31 - 1)
        # int4 pools pack two TOKENS per byte (quant.py layout): half the
        # page rows at the full head_dim; scales stay per token.
        # LAYER-FOLDED page axis (see paged_forward): page p of layer l at
        # folded id p*L + l — one donated pool buffer for all layers, and
        # page-axis sharding chunks stay multiples of whole pages.
        pool_rows = page_size // 2 if self.kv_int4 else page_size
        pool_dt = jnp.int8 if self.kv_int4 else kv_dtype
        pool_shape = (cfg.n_kv_heads,
                      sp * (num_pages + 1) * cfg.n_layers,
                      pool_rows, cfg.head_dim)
        sc_shape = pool_shape[:2] + (page_size, 1)
        self._pool_sharding = None
        if mesh is None:
            self.k_pool = jnp.zeros(pool_shape, pool_dt)
            self.v_pool = jnp.zeros(pool_shape, pool_dt)
            self.k_scales = self.v_scales = None
            if self.quantized:
                self.k_scales = jnp.ones(sc_shape, jnp.float32)
                self.v_scales = jnp.ones(sc_shape, jnp.float32)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from flash_attn_v100_tpu.parallel.mesh import MODEL_AXIS, SEQ_AXIS
            page_ax = SEQ_AXIS if sp > 1 else None
            sh = NamedSharding(mesh, P(MODEL_AXIS, page_ax, None, None))
            self._pool_sharding = sh
            # SPMD allocation: jit with out_shardings creates the GLOBAL
            # arrays directly (each process materializes only its shards —
            # required in multiprocess mode, also skips the host round-trip
            # device_put would pay single-process)
            mk = jax.jit(lambda: (jnp.zeros(pool_shape, pool_dt),
                                  jnp.zeros(pool_shape, pool_dt)),
                         out_shardings=(sh, sh))
            self.k_pool, self.v_pool = mk()
            self.k_scales = self.v_scales = None
            if self.quantized:
                mks = jax.jit(lambda: (jnp.ones(sc_shape, jnp.float32),
                                       jnp.ones(sc_shape, jnp.float32)),
                              out_shardings=(sh, sh))
                self.k_scales, self.v_scales = mks()
        self.greedy = greedy
        self.temperature = temperature
        self.default_sampling = SamplingParams(
            temperature=0.0 if greedy else float(temperature))
        # sampling RNG: a host-side step counter folded into a fixed base key
        # INSIDE the jitted step — deterministic across processes (the key
        # never lives as a process-local device array)
        self._rng_seed = int(rng_seed)
        self._rng_ctr = 0
        self._prev_tok = None               # last step's (max_batch,) tokens
        # the array lazy `generated` entries reference, and the first index
        # of a row's LAST entry into it (None: 1D single-step array, entries
        # are (arr, row); int i: fused (n, max_batch) array, (arr, (i, row)))
        self._prev_src = None
        self._prev_last: Optional[int] = None
        self.eos_token_id = eos_token_id
        self.eos_check_interval = max(1, eos_check_interval)
        # steady-state decode caches: (ids, page_counts, bt_dev, cs_dev);
        # device constants for the identity token gather
        self._steady = None
        self._id_gather = self._put(np.arange(max_batch, dtype=np.int32))
        self._all_dev = self._put(np.zeros((max_batch,), bool))
        self._zero_toks = self._put(np.zeros((max_batch,), np.int32))
        self._seqs: Dict[int, _Seq] = {}
        self._next_id = 0
        self._interpret = interpret
        # ONE jitted dispatch per engine step: the forward, the token gather
        # feeding it, and the sampling all fuse — over a remote-tunnel link
        # each separate op dispatch costs ~RTT, which otherwise dominates
        def core(params, kp, vp, ks, vs, toks, cs, bt):
            if self.quantized:
                return paged_forward(params, kp, vp, toks, cs, bt, cfg=cfg,
                                     k_scales=ks, v_scales=vs, mesh=mesh,
                                     interpret=interpret)
            logits, kp, vp = paged_forward(params, kp, vp, toks, cs, bt,
                                           cfg=cfg, mesh=mesh,
                                           interpret=interpret)
            return logits, kp, vp, ks, vs

        rng_seed_const = self._rng_seed

        def _key(ctr):
            return jax.random.fold_in(jax.random.PRNGKey(rng_seed_const), ctr)

        max_batch_const = max_batch

        def prefill_fn(params, kp, vp, ks, vs, toks, cs, bt, last_idx, ctr,
                       temp, topk, topp):
            logits, kp, vp, ks, vs = core(params, kp, vp, ks, vs, toks, cs, bt)
            last = jnp.take_along_axis(
                logits, last_idx[:, None, None], axis=1)[:, 0]
            tok = _sample_rows(last, _key(ctr), temp, topk, topp)
            # pad to the full batch width: the decode step gathers from the
            # previous token array, and a row-bucketed prefill emitting a
            # short array would fork decode compilations per bucket
            if tok.shape[0] < max_batch_const:
                tok = jnp.pad(tok, (0, max_batch_const - tok.shape[0]))
            return tok, kp, vp, ks, vs

        def decode_fn(params, kp, vp, ks, vs, prev_tok, gather_idx, use_host,
                      host_toks, cs, bt, ctr, temp, topk, topp):
            toks = jnp.where(use_host, host_toks, prev_tok[gather_idx])
            logits, kp, vp, ks, vs = core(params, kp, vp, ks, vs,
                                          toks[:, None], cs, bt)
            # cs advances deterministically: steady-state steps reuse the
            # returned device array — no host->device transfer on the loop
            return (_sample_rows(logits[:, 0], _key(ctr), temp, topk, topp),
                    cs + 1, kp, vp, ks, vs)

        def make_decode_multi(n):
            # n fused decode steps in one dispatch: the scan carries the
            # token, cache_seqlens, and pools; keys fold ctr+i, so the token
            # stream is bit-identical to n single decode_fn steps.  Only
            # dispatched when the batch is steady AND every row has page
            # capacity and token budget for the whole window, so no host
            # decision can be needed mid-window.
            def decode_multi(params, kp, vp, ks, vs, prev_tok, gather_idx,
                             use_host, host_toks, cs, bt, ctr, temp, topk,
                             topp):
                tok0 = jnp.where(use_host, host_toks, prev_tok[gather_idx])

                def body(carry, i):
                    tok, cs, kp, vp, ks, vs = carry
                    logits, kp, vp, ks, vs = core(params, kp, vp, ks, vs,
                                                  tok[:, None], cs, bt)
                    nxt = _sample_rows(logits[:, 0], _key(ctr + i),
                                       temp, topk, topp)
                    return (nxt, cs + 1, kp, vp, ks, vs), nxt

                (last, cs_f, kp, vp, ks, vs), toks = jax.lax.scan(
                    body, (tok0, cs, kp, vp, ks, vs),
                    jnp.arange(n, dtype=jnp.int32))
                return toks, last, cs_f, kp, vp, ks, vs
            return decode_multi

        self._make_decode_multi = make_decode_multi
        self._decode_multi: Dict[int, Any] = {}
        if decode_fuse < 1:
            raise ValueError("decode_fuse must be positive")
        self.decode_fuse = decode_fuse

        n_layers_const = cfg.n_layers

        def copy_pages_fn(kp, vp, ks, vs, src, dst):
            # prefix-cache page copy on the layer-folded page axis (1):
            # a page id expands to its L folded entries; padding entries
            # are src == dst == 0 (scratch -> itself, a no-op value-wise)
            def fold(ids):
                return (ids[:, None] * n_layers_const
                        + jnp.arange(n_layers_const, dtype=ids.dtype)
                        ).reshape(-1)
            src_f, dst_f = fold(src), fold(dst)
            kp = kp.at[:, dst_f].set(kp[:, src_f])
            vp = vp.at[:, dst_f].set(vp[:, src_f])
            if self.quantized:
                ks = ks.at[:, dst_f].set(ks[:, src_f])
                vs = vs.at[:, dst_f].set(vs[:, src_f])
            return kp, vp, ks, vs

        dn = self._donate = (1, 2, 3, 4) if self.quantized else (1, 2)
        # tokens (and the advanced cache_seqlens) come back REPLICATED so
        # every process holds them addressably; pools keep their placement
        rep = self._rep_sharding
        psh = self._pool_sharding
        ssh = psh if self.quantized else rep
        pf_out = dec_out = cp_out = None
        self._multi_out = None
        if mesh is not None:
            pf_out = (rep, psh, psh, ssh, ssh)
            dec_out = (rep, rep, psh, psh, ssh, ssh)
            cp_out = (psh, psh, ssh, ssh)
            self._multi_out = (rep, rep, rep, psh, psh, ssh, ssh)
        self._prefill_fn = jax.jit(prefill_fn, donate_argnums=dn,
                                   out_shardings=pf_out)
        self._decode_fn = jax.jit(decode_fn, donate_argnums=dn,
                                  out_shardings=dec_out)
        self._copy_pages_fn = jax.jit(
            copy_pages_fn,
            donate_argnums=(0, 1, 2, 3) if self.quantized else (0, 1),
            out_shardings=cp_out)
        self.prefix_cache = prefix_cache
        # chain hash -> (owner sid, n full pages covered)
        self._prefix_index: Dict[int, Tuple[int, int]] = {}
        # scale placeholders so the jitted signature is uniform
        if not self.quantized:
            self.k_scales = self._put(np.zeros((1,), np.float32))
            self.v_scales = self._put(np.zeros((1,), np.float32))
        self.metrics = dict(steps=0, tokens_generated=0, prefill_tokens=0,
                            prefix_hits=0, prefix_tokens_reused=0)

    # ---- request API ----

    def submit(self, prompt: List[int], max_new_tokens: int = 64,
               sampling: Optional[SamplingParams] = None,
               on_token=None) -> int:
        """`sampling` overrides the engine default per request.  `on_token`
        is called as on_token(rid, new_tokens) whenever this request's
        tokens materialize on the host — at the periodic EOS sweep, on
        re-prefill, and at completion (tokens stay device-resident between
        sweeps by design, so streaming granularity is the sweep interval,
        not per step)."""
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) + max_new_tokens > self.cfg.max_seq_len:
            raise ValueError("prompt + max_new_tokens exceeds max_seq_len")
        rid = self._next_id
        self._next_id += 1
        s = _Seq(rid, list(prompt), max_new_tokens,
                 submitted_at=time.monotonic(),
                 sampling=sampling, on_token=on_token)
        if self.prefix_cache:
            h, ps = 0, self.page_size
            for j in range(len(prompt) // ps):
                h = hash((h,) + tuple(prompt[j * ps:(j + 1) * ps]))
                s.page_hashes.append(h)
        self._seqs[rid] = s
        ok = self.sched.add(rid, len(prompt), max_new_tokens)
        assert ok
        return rid

    def idle(self) -> bool:
        st = self.sched.stats()
        return st["waiting"] == 0 and st["running"] == 0

    @staticmethod
    def _materialize(s: "_Seq") -> None:
        # ONE device->host transfer for all lazy entries (each entry fetched
        # separately would cost a tunnel round trip per token)
        uniq = {}
        for e in s.generated:
            if not isinstance(e, int):
                uniq.setdefault(id(e[0]), e[0])
        if uniq:
            fetched = {k: v for k, v in zip(uniq,
                                            jax.device_get(list(uniq.values())))}
            s.generated = [e if isinstance(e, int)
                           else int(fetched[id(e[0])][e[1]])
                           for e in s.generated]
        if s.on_token is not None and len(s.generated) > s.streamed:
            new = s.generated[s.streamed:]
            s.streamed = len(s.generated)
            s.on_token(s.id, [int(t) for t in new])

    def result(self, rid: int) -> List[int]:
        s = self._seqs[rid]
        self._materialize(s)
        return list(s.generated)

    def ttft(self, rid: int) -> Optional[float]:
        s = self._seqs[rid]
        return None if s.first_token_at is None else (
            s.first_token_at - s.submitted_at)

    # ---- the decode loop body ----

    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return b

    def _block_table(self, ids: List[int]) -> np.ndarray:
        bt = np.zeros((self.max_batch, self.max_pages_per_seq), np.int32)
        for row, sid in enumerate(ids):
            pages = self.sched.pages_of(sid)
            # +1: page 0 is the scratch page; scheduler ids are 0-based
            bt[row, :len(pages)] = np.asarray(pages, np.int32) + 1
        return bt

    def _put(self, x):
        """Host array -> array every process can feed the jitted step:
        multiprocess, a GLOBAL fully-replicated array assembled from the
        (identical) process-local data; otherwise a plain local array."""
        if not self.multiprocess:
            return jnp.asarray(x)
        return jax.make_array_from_process_local_data(
            self._rep_sharding, np.asarray(x))

    def _next_ctr(self):
        return self._next_ctrs(1)

    def _next_ctrs(self, n: int):
        """Reserve n consecutive RNG counters; returns the FIRST as a device
        scalar (fused steps fold ctr+i, matching n unfused steps exactly)."""
        first = self._rng_ctr + 1
        self._rng_ctr += n
        return self._put(np.int32(first))

    def _get_decode_multi(self, n: int):
        fn = self._decode_multi.get(n)
        if fn is None:
            fn = jax.jit(self._make_decode_multi(n),
                         donate_argnums=self._donate,
                         out_shardings=self._multi_out)
            self._decode_multi[n] = fn
        return fn

    def _sampling_arrays(self, ids: List[int], rows: Optional[int] = None):
        """(temperature, top_k, top_p) per batch row, padded rows greedy."""
        rows = self.max_batch if rows is None else rows
        temp = np.zeros((rows,), np.float32)
        topk = np.zeros((rows,), np.int32)
        topp = np.ones((rows,), np.float32)
        for row, sid in enumerate(ids):
            sp = self._seqs[sid].sampling or self.default_sampling
            temp[row] = sp.temperature
            topk[row] = sp.top_k
            topp[row] = sp.top_p
        return self._put(temp), self._put(topk), self._put(topp)

    def step(self) -> List[int]:
        """Advance every running sequence one token.  Returns ids finished
        during this step."""
        batch = self.sched.step()
        if not batch:
            return []
        prefill = [sid for sid, pf in batch if pf]
        decode = [sid for sid, pf in batch if not pf]
        if self.max_prefill_seqs is not None and len(prefill) > 0:
            # staggered admission: chunk continuations keep priority (a
            # deferred continuation reads as preemption and restarts);
            # deferred sequences stay needs_prefill in the scheduler
            cont = [s for s in prefill if self._seqs[s].prefill_committed]
            new = [s for s in prefill if not self._seqs[s].prefill_committed]
            keep = max(self.max_prefill_seqs, len(cont))
            prefill = (cont + new)[:keep]
        finished: List[int] = []
        if prefill:
            self._run_prefill(prefill, finished)
        if decode:
            self._run_decode(decode, finished)
        self.metrics["steps"] += 1
        for sid in finished:
            self._finish(sid)
        if (self.eos_token_id is not None
                and self.metrics["steps"] % self.eos_check_interval == 0):
            finished += self._reap_eos(batch)
        return finished

    def _finish(self, sid: int) -> None:
        self.sched.finish(sid)
        s = self._seqs[sid]
        s.done = True
        # freed pages must stop serving as prefix-copy sources
        for h in s.page_hashes:
            if self._prefix_index.get(h, (None, 0))[0] == sid:
                del self._prefix_index[h]

    def _reap_eos(self, batch) -> List[int]:
        """Periodic EOS sweep: ONE batched fetch of every pending token
        array, then finish sequences whose output contains the EOS (truncated
        exactly at it)."""
        running = [sid for sid, _ in batch if not self._seqs[sid].done]
        uniq = {}
        for sid in running:
            for e in self._seqs[sid].generated:
                if not isinstance(e, int):
                    uniq.setdefault(id(e[0]), e[0])
        fetched = ({k: v for k, v in zip(uniq, jax.device_get(list(uniq.values())))}
                   if uniq else {})
        reaped = []
        for sid in running:
            s = self._seqs[sid]
            s.generated = [e if isinstance(e, int)
                           else int(fetched[id(e[0])][e[1]])
                           for e in s.generated]
            if s.on_token is not None and len(s.generated) > s.streamed:
                s.on_token(sid, [int(t) for t in s.generated[s.streamed:]])
                s.streamed = len(s.generated)
            if self.eos_token_id in s.generated:
                s.generated = s.generated[:s.generated.index(self.eos_token_id) + 1]
                self._finish(sid)
                reaped.append(sid)
        if reaped:
            self._steady = None   # batch composition changes next step
        return reaped

    def run_to_completion(self, max_steps: int = 100_000) -> Dict[int, List[int]]:
        out = {}
        for _ in range(max_steps):
            if self.idle():
                break
            for sid in self.step():
                out[sid] = self.result(sid)
        return out

    def _prefix_lookup(self, sid: int, batch_ids) -> Tuple[List[int], int]:
        """Longest committed whole-page prompt prefix of `sid` held by a
        LIVE other sequence: returns (source page ids, n pages).  The hash
        only indexes — token equality is checked exactly; sources that are
        finished, preempted (no pages / prefilled=False), or prefilling in
        this same batch are rejected."""
        s = self._seqs[sid]
        ps = self.page_size
        max_i = min(len(s.page_hashes), (len(s.prompt) - 1) // ps)
        for i in range(max_i, 0, -1):
            ent = self._prefix_index.get(s.page_hashes[i - 1])
            if not ent:
                continue
            src_id, n = ent
            if src_id == sid or src_id in batch_ids or n < i:
                continue
            src = self._seqs.get(src_id)
            if src is None or src.done or not src.prefilled:
                continue
            if src.prompt[:i * ps] != s.prompt[:i * ps]:
                continue
            src_pages = self.sched.pages_of(src_id)
            if len(src_pages) < i:
                continue
            return src_pages[:i], i
        return [], 0

    def _run_prefill(self, ids: List[int], finished: List[int]) -> None:
        # after preemption a sequence re-prefills prompt + already-emitted
        # tokens in one pass (the scheduler kept its generated count);
        # re-prefill is the one place mid-generation token VALUES are needed
        for sid in ids:
            self._materialize(self._seqs[sid])
            self._seqs[sid].prefilled = False
        # chunked prefill: a continuation is valid only if the sequence was
        # in the previous step's batch (running sequences always are; a gap
        # means preemption) AND the pages holding its committed tokens are
        # the ones it chunked into — otherwise the KV is gone, restart
        step_no = self.metrics["steps"]
        for sid in ids:
            s = self._seqs[sid]
            if s.prefill_committed:
                k = len(s.chunk_page_ids)
                if (s.last_chunk_step != step_no - 1
                        or self.sched.pages_of(sid)[:k] != s.chunk_page_ids):
                    s.prefill_committed = 0
                    s.chunk_page_ids = []
        # prefix cache: rows whose prompt prefix is already committed in a
        # live sequence's pages copy that KV and prefill only the suffix
        cached = {sid: 0 for sid in ids}
        if self.prefix_cache:
            batch_set = set(ids)
            # seq-mesh pools: page ids are SHARD-LOCAL per block-table slot
            # range; slot j's physical page-axis index carries the offset of
            # the shard owning column j.  Source and destination prefixes
            # cover the same slots 0..npg-1, so every copy is shard-local.
            spp = (self.max_pages_per_seq // self.seq_shards
                   if self.seq_shards > 1 else None)
            shard_pages = self.sched.num_pages + 1

            def phys(slot: int, page: int) -> int:
                off = (slot // spp) * shard_pages if spp else 0
                return off + page + 1           # +1: scratch page
            src_idx, dst_idx = [], []
            for sid in ids:
                if self._seqs[sid].prefill_committed:
                    continue            # mid-chunk: prefix already handled
                src_pages, npg = self._prefix_lookup(sid, batch_set)
                if npg:
                    dst_pages = self.sched.pages_of(sid)[:npg]
                    src_idx += [phys(j, p) for j, p in enumerate(src_pages)]
                    dst_idx += [phys(j, p) for j, p in enumerate(dst_pages)]
                    cached[sid] = npg * self.page_size
                    self.metrics["prefix_hits"] += 1
                    self.metrics["prefix_tokens_reused"] += npg * self.page_size
            if src_idx:
                pad = self._bucket(len(src_idx)) - len(src_idx)
                (self.k_pool, self.v_pool, self.k_scales,
                 self.v_scales) = self._copy_pages_fn(
                    self.k_pool, self.v_pool, self.k_scales, self.v_scales,
                    self._put(np.asarray(src_idx + [0] * pad, np.int32)),
                    self._put(np.asarray(dst_idx + [0] * pad, np.int32)))
        # spans: (sid, base, take, final) — this step appends tokens
        # [base, base+take) of prompt+generated; only final rows (take
        # reaches the end) sample a real next token
        spans = []
        for sid in ids:
            s = self._seqs[sid]
            full_len = len(s.prompt) + len(s.generated)
            b = s.prefill_committed or cached[sid]
            rem = full_len - b
            take = rem if self.prefill_chunk is None else min(
                rem, self.prefill_chunk)
            spans.append((sid, b, take, take == rem))
        lens = [t for _, _, t, _ in spans]
        # bucket to bound recompiles; cap at max_seq_len so padded append
        # positions never walk off a full block-table row
        T = min(self._bucket(max(lens)), self.cfg.max_seq_len)
        # ROW bucket too: a prefill of n sequences runs on a
        # (next_pow2(n), T) batch, not (max_batch, T) — padding a 1-row
        # trickle-in (or a staggered-admission group) to the full batch
        # width multiplies prefill FLOPs by max_batch/n.  Power-of-two
        # buckets bound the compile count.
        rb = 2
        while rb < len(ids):
            rb *= 2
        rb = min(rb, self.max_batch)
        toks = np.zeros((rb, T), np.int32)
        last_idx = np.zeros((rb,), np.int32)
        cs = np.zeros((rb,), np.int32)  # append position
        for row, (sid, b, take, _) in enumerate(spans):
            s = self._seqs[sid]
            toks[row, :take] = (s.prompt + s.generated)[b:b + take]
            last_idx[row] = take - 1   # sample at the last REAL position
            cs[row] = b
        temp, topk, topp = self._sampling_arrays(ids, rows=rb)
        (tok, self.k_pool, self.v_pool,
         self.k_scales, self.v_scales) = self._prefill_fn(
            self.params, self.k_pool, self.v_pool,
            self.k_scales, self.v_scales,
            self._put(toks), self._put(cs),
            self._put(self._block_table(ids)[:rb]), self._put(last_idx),
            self._next_ctr(), temp, topk, topp)
        self._emit(ids, tok, finished, first=True,
                   emit=[fin for _, _, _, fin in spans])
        self.metrics["prefill_tokens"] += int(sum(lens))
        ps = self.page_size
        for sid, b, take, fin in spans:
            s = self._seqs[sid]
            if fin:
                s.prefilled = True
                s.prefill_committed = 0
                s.chunk_page_ids = []
                for j, h in enumerate(s.page_hashes):
                    self._prefix_index[h] = (sid, j + 1)
            else:
                s.prefill_committed = b + take
                s.chunk_page_ids = self.sched.pages_of(sid)[
                    :-(-(b + take) // ps)]
                s.last_chunk_step = step_no
        # NOTE: rows were padded to the bucket; the garbage KV the padding
        # appended sits at positions >= prompt_len, and the next append for
        # this sequence starts exactly at prompt_len (cache_seqlens below),
        # overwriting it. Padding-row queries only ever see keys <= their own
        # position (causal), so real logits are unaffected.

    def _run_decode(self, ids: List[int], finished: List[int]) -> None:
        # input tokens stay on DEVICE: each row's last generated token is
        # usually a slot of the PREVIOUS step's token array, gathered inside
        # the single jitted step (a host fetch per step would put the tunnel
        # RTT on the critical path).  Rows whose last token lives in an older
        # array (batch composition changed) fall back to a one-off fetch.
        prev = self._prev_tok
        ids_t = tuple(ids)
        counts = tuple(len(self.sched.pages_of(sid)) for sid in ids)
        st = self._steady
        li = self._prev_last
        steady = (st is not None and st[0] == ids_t and st[1] == counts
                  and prev is not None
                  and all(not isinstance(self._seqs[sid].generated[-1], int)
                          and self._seqs[sid].generated[-1][0]
                          is self._prev_src
                          and self._seqs[sid].generated[-1][1]
                          == (row if li is None else (li, row))
                          for row, sid in enumerate(ids)))
        if steady:
            # zero host->device traffic: identity gather from the previous
            # step's tokens, cached block table, device-incremented cs,
            # cached per-row sampling arrays
            bt_dev, cs_dev = st[2], st[3]
            temp, topk, topp = st[4]
            gather_idx, use_host, host_toks = (
                self._id_gather, self._all_dev, self._zero_toks)
            # fused multi-step decode: the largest power-of-two window every
            # row can run without a host decision — bounded by its page
            # capacity (appends at cs..cs+n-1 must stay inside allocated
            # pages) and its remaining token budget (a finish mid-window
            # would change the batch)
            n = 1
            if self.decode_fuse > 1:
                lim = self.decode_fuse
                ps = self.page_size
                for row, sid in enumerate(ids):
                    s = self._seqs[sid]
                    cs_row = len(s.prompt) + len(s.generated) - 1
                    lim = min(lim, counts[row] * ps - cs_row,
                              s.max_new_tokens - len(s.generated))
                while n * 2 <= lim:
                    n *= 2
            if n > 1:
                (toks, last, cs_next, self.k_pool, self.v_pool,
                 self.k_scales, self.v_scales) = self._get_decode_multi(n)(
                    self.params, self.k_pool, self.v_pool,
                    self.k_scales, self.v_scales,
                    prev, gather_idx, use_host, host_toks, cs_dev, bt_dev,
                    self._next_ctrs(n), temp, topk, topp)
                self._emit_multi(ids, toks, last, n, finished)
                self._steady = (ids_t, counts, bt_dev, cs_next,
                                (temp, topk, topp))
                return
        else:
            cs = np.zeros((self.max_batch,), np.int32)
            gather_np = np.zeros((self.max_batch,), np.int32)
            usehost_np = np.ones((self.max_batch,), bool)
            hosttok_np = np.zeros((self.max_batch,), np.int32)
            for row, sid in enumerate(ids):
                s = self._seqs[sid]
                e = s.generated[-1]
                # a last token produced by the previous step is gatherable
                # from `prev` at its old row — for a fused window `prev` is
                # the final scan row, so entries (src, (li, old_row)) map to
                # prev[old_row] the same way 1D entries (src, old_row) do
                old_row = None
                if not isinstance(e, int) and prev is not None \
                        and e[0] is self._prev_src:
                    old_row = (e[1] if li is None
                               else (e[1][1] if e[1][0] == li else None))
                if old_row is not None:
                    gather_np[row] = old_row
                    usehost_np[row] = False
                else:
                    hosttok_np[row] = (e if isinstance(e, int)
                                       else int(np.asarray(e[0])[e[1]]))
                # KV covers prompt + all generated EXCEPT the last token,
                # which is this step's input, appended at this position
                cs[row] = len(s.prompt) + len(s.generated) - 1
            bt_dev = self._put(self._block_table(ids))
            cs_dev = self._put(cs)
            gather_idx = self._put(gather_np)
            use_host = self._put(usehost_np)
            host_toks = self._put(hosttok_np)
            temp, topk, topp = self._sampling_arrays(ids)
        (tok, cs_next, self.k_pool, self.v_pool,
         self.k_scales, self.v_scales) = self._decode_fn(
            self.params, self.k_pool, self.v_pool,
            self.k_scales, self.v_scales,
            prev if prev is not None else self._zero_toks,
            gather_idx, use_host, host_toks, cs_dev, bt_dev,
            self._next_ctr(), temp, topk, topp)
        self._emit(ids, tok, finished)
        # next step is steady if the batch stays identical and no sequence
        # crossed a page boundary (counts recomputed then)
        self._steady = (ids_t, counts, bt_dev, cs_next, (temp, topk, topp))

    def _emit(self, ids: List[int], tokens: np.ndarray, finished: List[int],
              first: bool = False, emit: Optional[List[bool]] = None) -> None:
        """`emit[row]=False` (mid-chunk prefill rows): the sampled token is
        garbage by construction — no token is recorded or counted."""
        self._prev_tok = tokens             # (max_batch,) device array
        self._prev_src = tokens
        self._prev_last = None
        stamp_rows = []
        for row, sid in enumerate(ids):
            if emit is not None and not emit[row]:
                continue
            s = self._seqs[sid]
            s.generated.append((tokens, row))   # lazy device token
            if first and s.first_token_at is None:
                stamp_rows.append(sid)
            self.metrics["tokens_generated"] += 1
            if self.sched.advance(sid):
                finished.append(sid)
        if stamp_rows:
            # TTFT is stamped only once the token VALUE exists: block on the
            # device array, then take the clock.  Stamping at dispatch would
            # time the async enqueue (microseconds), not the prefill — only
            # first-token (prefill) steps pay this sync, the decode loop
            # stays fully asynchronous.
            jax.block_until_ready(tokens)
            now = time.monotonic()
            for sid in stamp_rows:
                self._seqs[sid].first_token_at = now

    def _emit_multi(self, ids: List[int], toks, last, n: int,
                    finished: List[int]) -> None:
        """Record a fused n-step window: `toks` is the (n, max_batch) token
        matrix, `last` its final row (the next step's gather source, computed
        in-graph).  The n cap guarantees a row can finish only at the window
        end."""
        self._prev_tok = last
        self._prev_src = toks
        self._prev_last = n - 1
        for row, sid in enumerate(ids):
            s = self._seqs[sid]
            for i in range(n):
                s.generated.append((toks, (i, row)))
            self.metrics["tokens_generated"] += n
            for _ in range(n):
                if self.sched.advance(sid):
                    finished.append(sid)
