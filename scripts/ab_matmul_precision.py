"""A/B the frozen-DINO trunk under jax matmul-precision settings (TPU).

Unlike the rejected bf16 *tensor* casts (scripts/ab_dino_bf16.py — layout
conversions around the trunk ate the gain), `jax.default_matmul_precision`
only changes the MXU pass count for f32 matmuls: tensors, layouts and every
op boundary stay f32. Reference parity note: the torch-1.10 reference runs
the same trunk under Ampere TF32 (matmul + cuDNN conv allow_tf32 default
True in 1.10), i.e. 10-bit-mantissa multiplies — full-f32 is *stricter*
than the reference, 'high' (bf16_3x, ~21-bit) is comparable, 'default'
(single-pass bf16, 8-bit) is looser.

Run solo on the TPU: python scripts/ab_matmul_precision.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def time_chained(step, x0, iters=10, intervals=3):
    x = step(x0)
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))
    best = float("inf")
    for _ in range(intervals):
        t0 = time.time()
        for _ in range(iters):
            x = step(x)
        float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))
        best = min(best, (time.time() - t0) / iters * 1000)
    return best


def main():
    from selfcorr_tpu.utils.jit_cache import enable as _enable_cache
    _enable_cache()
    from selfcorr_tpu.models.vit import DinoViTS8

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(32, 256, 256, 3).astype(np.float32))
    dino = DinoViTS8()
    params = dino.init(jax.random.PRNGKey(0), img[:1])["params"]

    ref = None
    for prec in [None, "tensorfloat32", "bfloat16"]:
        @jax.jit
        def f(x, prec=prec):
            if prec is None:
                y = dino.apply({"params": params}, x)
            else:
                with jax.default_matmul_precision(prec):
                    y = dino.apply({"params": params}, x)
            return x + 1e-30 * y.mean(), y

        g = lambda x: f(x)[0]
        t = time_chained(g, img)
        _, y = f(img)
        y = np.asarray(y)
        if ref is None:
            ref = y
            err = 0.0
        else:
            err = float(np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9))
        print(f"dino trunk fwd (B=32) precision={prec or 'backend-default'}: "
              f"{t:.1f} ms   max-rel-err vs default: {err:.2e}")


if __name__ == "__main__":
    main()
