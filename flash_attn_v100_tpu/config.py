"""Global runtime configuration.

The reference selects kernel backends at build time via env vars
(MMA_NATIVE/MMA_884, reference: setup.py:65-79).  The TPU build selects at
runtime: Pallas-compiled on TPU, Pallas-interpret on CPU (so the whole test
suite runs hermetically on a CPU host), or a pure-XLA fallback.
"""

from __future__ import annotations

import os
import functools


@functools.lru_cache(None)
def default_backend() -> str:
    import jax

    return jax.default_backend()


def use_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    True on non-TPU backends (CPU testing), overridable with
    FLASH_ATTN_TPU_INTERPRET=0/1.
    """
    env = os.environ.get("FLASH_ATTN_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return default_backend() != "tpu"


def set_interpret(enabled: bool) -> None:
    """Process-wide interpret-mode override (per-call `interpret=` wins)."""
    os.environ["FLASH_ATTN_TPU_INTERPRET"] = "1" if enabled else "0"


# Numerical constants (reference: include/kernel.h:20 uses NEG_INF = -1e30f as
# the additive mask value; exp() is clamped at -80 in include/softmax.h:89-92).
NEG_INF = -1e30
EXP_CLAMP = -80.0


def kernel_dtype(dtype, interpret: bool):
    """TPU hardware has no fp16 (Mosaic rejects 'f16'); the native 16-bit type
    is bfloat16.  fp16 tensors are computed in bf16 on TPU (all softmax math is
    fp32 regardless) and cast back on output.  Interpret mode (CPU tests) keeps
    true fp16 so the same-bit-width parity gates of the reference's tolerance
    model hold there."""
    import jax.numpy as jnp

    if not interpret and dtype == jnp.float16:
        return jnp.bfloat16
    return dtype
