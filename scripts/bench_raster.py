"""Rasterizer microbenchmark at flagship shapes (642 verts / 1280 faces,
256^2, B=32 scattered scene) — isolates the fused kernel fwd and fwd+bwd
cost that PERF.md's step breakdown attributes ~45% of the train step to.

Run solo on the TPU (one chip, serial use): python scripts/bench_raster.py
"""
from __future__ import annotations

import os
import sys
import time

# self-locate the repo: do NOT ask callers to set PYTHONPATH — overwriting it
# drops /root/.axon_site (how the axon TPU plugin reaches sys.path) and the
# backend then fails to register
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def scattered_scene(b=32, v=642, f=1280, seed=0):
    """Random triangle soup spread over the frame — the same scene family
    PERF.md's raster numbers use (worst-ish case: wide bbox spread)."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-0.8, 0.8, (b, f, 1, 2))
    tri = rng.uniform(-0.06, 0.06, (b, f, 3, 2))
    xy = centers + tri
    z = 4.0 + rng.rand(b, f, 3, 1) * 2.0
    fv = np.concatenate([xy, z], -1).astype(np.float32)
    tex = rng.rand(b, f, 3, 3).astype(np.float32)
    return jnp.asarray(fv), jnp.asarray(tex)


def ico_scene(b=32, seed=0, subdivide=3):
    """Realistic scene: projected icospheres (coherent faces) — matches the
    training distribution better than the soup."""
    from selfcorr_tpu.ops.mesh_ops import icosphere
    verts, faces = icosphere(subdivide)
    rng = np.random.RandomState(seed)
    out = []
    for i in range(b):
        s = rng.uniform(0.3, 0.6)
        off = rng.uniform(-0.4, 0.4, (1, 2))
        v2 = verts[:, :2] * s + off
        z = verts[:, 2:] * s + 5.0
        out.append(np.concatenate([v2, z], -1))
    fv = np.stack(out)[:, faces].astype(np.float32)
    tex = rng.rand(b, faces.shape[0], 3, 3).astype(np.float32)
    return jnp.asarray(fv), jnp.asarray(tex)


def _time_chained(step, x0, iters, intervals=3):
    """Time a jitted x -> x step on the tunneled axon backend.

    block_until_ready does NOT sync there (only value fetches do), and
    independent dispatches just queue — so each iteration is CHAINED through
    its predecessor's output and the interval ends with a scalar fetch.
    Returns best per-iter ms over `intervals` runs (tunnel hiccup immunity),
    fetch overhead amortized over `iters`."""
    x = step(x0)
    float(jnp.sum(x))  # compile + settle
    best = float("inf")
    for _ in range(intervals):
        t0 = time.time()
        for _ in range(iters):
            x = step(x)
        float(jnp.sum(x))
        best = min(best, (time.time() - t0) / iters * 1000)
    return best


def bench(name, fv, tex, iters=20):
    from selfcorr_tpu.ops.rasterizer import render_fused

    fv = fv.at[..., 2].add(np.sqrt(3.0) + 1.0)  # EYE_OFFSET convention

    @jax.jit
    def fwd(fv):
        out = render_fused(fv, tex, tex, 256)
        # fold every output back into fv-shaped state: keeps iterations
        # chained without changing the rendered scene's statistics
        delta = (out["alpha1"].mean() + out["depth"].mean()
                 + out["tex"].mean() + out["match"].mean()
                 + out["alpha2"].mean())
        return fv + 1e-30 * delta  # not DCE-able, vanishes in f32 rounding

    @jax.jit
    def fwdbwd(fv):
        def loss(fv, tex):
            out = render_fused(fv, tex, tex, 256)
            return (out["alpha1"].mean() + out["alpha2"].mean()
                    + out["depth"].mean() + out["tex"].mean())
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(fv, tex)
        return fv + 1e-30 * (l + g[0].mean() + g[1].mean())

    t_fwd = _time_chained(fwd, fv, iters)
    t_all = _time_chained(fwdbwd, fv, iters)
    print(f"{name}: fwd {t_fwd:.1f} ms  fwd+bwd {t_all:.1f} ms "
          f"(bwd ~{t_all - t_fwd:.1f} ms)")


if __name__ == "__main__":
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    fv, tex = scattered_scene()
    bench("scattered B=32 F=1280", fv, tex)
    fv, tex = ico_scene()
    bench("icosphere B=32 F=1280", fv, tex)
