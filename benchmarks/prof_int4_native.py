"""Probe: does Mosaic on this chip support jnp.int4 refs + int4 dot_general?

If a Pallas kernel can load a packed jnp.int4 array and feed it to the MXU
directly, the nibble-split machinery in decode.py is obsolete.  This probe
is expected to fail on most stacks — it prints the failure mode instead of
raising.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def kernel(q_ref, k_ref, o_ref):
    q = q_ref[...]
    k = k_ref[...]
    o_ref[...] = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, (128, 128)), jnp.int4)
    k = jnp.asarray(rng.integers(-8, 8, (256, 128)), jnp.int4)
    for name, qq in [("int4xint4", q), ("int8xint4", q.astype(jnp.int8))]:
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((128, 256), jnp.int32),
            )(qq, k)
            ref = (np.asarray(qq, np.int32) @ np.asarray(k, np.int32).T)
            ok = np.array_equal(np.asarray(out), ref)
            print(f"{name}: LOWERED, correct={ok}")
        except Exception as e:
            print(f"{name}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}")


if __name__ == "__main__":
    main()
