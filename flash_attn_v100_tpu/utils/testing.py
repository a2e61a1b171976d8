"""Tolerance model + assert helpers.

Reimplements the reference's acceptance rule (reference: test.py:277, 331-334):
errors are bounded *relative to the same-bit-width oracle's own error* against
the fp32-upcast oracle, not by an absolute epsilon:

    err(kernel, oracle_fp32) <= mult * err(oracle_native, oracle_fp32) + atol

with mult=2, atol=1e-5 for forward and mult=3, atol=1e-4 for gradients, plus an
explicit NaN/Inf scan (reference: test.py:260-270, 305-319).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FWD_MULT, FWD_ATOL = 2.0, 1e-5
BWD_MULT, BWD_ATOL = 3.0, 1e-4


def max_abs_err(a, b) -> float:
    return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32))))


def assert_no_nan_inf(x, name="tensor"):
    x = np.asarray(x)
    n_nan = int(np.isnan(x).sum())
    n_inf = int(np.isinf(x).sum())
    assert n_nan == 0 and n_inf == 0, f"{name}: NaN={n_nan}, Inf={n_inf}"


def assert_close_rel(out, out_ref_fp32, out_ref_native, mult, atol, name="out"):
    """The relative-tolerance gate (reference: test.py:277)."""
    assert_no_nan_inf(out, name)
    err = max_abs_err(out, out_ref_fp32)
    err_ref = max_abs_err(out_ref_native, out_ref_fp32)
    bound = mult * err_ref + atol
    assert err <= bound, (
        f"{name}: err={err:.3e} > {mult}*err_ref({err_ref:.3e}) + {atol:.0e} = {bound:.3e}"
    )


def assert_fwd_close(out, out_ref_fp32, out_ref_native, name="out"):
    assert_close_rel(out, out_ref_fp32, out_ref_native, FWD_MULT, FWD_ATOL, name)


def assert_bwd_close(g, g_ref_fp32, g_ref_native, name="grad"):
    assert_close_rel(g, g_ref_fp32, g_ref_native, BWD_MULT, BWD_ATOL, name)
