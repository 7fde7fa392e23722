"""On-chip Pallas-vs-dense rasterizer parity gate (VERDICT r3 item 2).

Renders small scenes on the REAL TPU with both the Pallas kernels
(interpret=False — the compiled Mosaic path) and the dense jnp ground truth
(`ops/rasterizer/reference.py`, which pins the CUDA semantics of
soft_rasterize_cuda_kernel.cu:486-668), and asserts forward outputs AND
VJP cotangents allclose. Interpret-mode CPU tests cannot catch Mosaic
compilation/layout bugs (e.g. the round-3 SMEM-OOM incident); this gate
closes that class. Run after every kernel change and once per round:

    python scripts/parity_gate.py            # real chip (axon)
    python scripts/parity_gate.py --cpu      # interpret-mode smoke
    python scripts/parity_gate.py --compact  # per-tile face-list kernels

Scenes: (a) centered cluster (the common object-crop case), (b) scattered
faces across the full frame with varied sizes (exercises chunk culling /
bbox spans), (c) surface-texture mode (S_SURF texel grids). Image size 128
(the Pallas lane-tile multiple on real hardware).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def make_scene(seed=0, b=2, n_faces=64, size=0.7, z0=5.0, scattered=False):
    rng = np.random.RandomState(seed)
    if scattered:
        centers = rng.uniform(-0.9, 0.9, (b, n_faces, 1, 2))
        sizes = rng.uniform(0.05, 0.9, (b, n_faces, 1, 1))
        tri = rng.uniform(-0.5, 0.5, (b, n_faces, 3, 2)) * sizes
    else:
        centers = rng.uniform(-0.5, 0.5, (b, n_faces, 1, 2))
        tri = rng.uniform(-size / 2, size / 2, (b, n_faces, 3, 2))
    xy = np.clip(centers + tri, -0.98, 0.98)
    z = z0 + rng.uniform(-1.0, 1.0, (b, n_faces, 3, 1))
    fv = np.concatenate([xy, z], axis=-1).astype(np.float32)
    soft_tex = rng.rand(b, n_faces, 3, 3).astype(np.float32)
    hard_tex = rng.rand(b, n_faces, 3, 3).astype(np.float32)
    return fv, soft_tex, hard_tex


def check(name, pallas, dense, atol, report, outlier_frac=0.0):
    """outlier_frac > 0 tolerates a small fraction of large-error elements:
    the 'surface' texel lookup is DISCONTINUOUS (cell + diagonal fold,
    kernel.cu:178-195) and pixels whose clipped barycentrics land exactly
    on a fold boundary (w*res integer — common for pixels on/outside
    triangle edges) legitimately flip texels between backends on ulp-level
    w differences. Verified: every such diverging pixel sits at
    |fold-1| = 0 exactly in the dense w field. A Mosaic compile bug
    corrupts whole tiles, which this still catches."""
    a, d = np.asarray(pallas), np.asarray(dense)
    assert np.isfinite(a).all(), f"{name}: non-finite pallas output"
    err = np.abs(a - d)
    report[name] = round(float(err.max()), 8)
    if outlier_frac == 0.0:
        assert err.max() <= atol, f"{name}: max abs err {err.max()} > {atol}"
    else:
        frac = float((err > atol).mean())
        assert frac <= outlier_frac, (
            f"{name}: {frac:.4%} elements exceed {atol} "
            f"(allowed {outlier_frac:.2%})")


def main():
    on_cpu = "--cpu" in sys.argv
    if on_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from selfcorr_tpu.utils import jit_cache
        jit_cache.enable()
    import jax
    import jax.numpy as jnp
    from selfcorr_tpu.ops.rasterizer import render_fused

    if "--compact" in sys.argv:  # gate the per-tile face-list kernels
        from selfcorr_tpu.ops.rasterizer import pallas_raster as P
        P.COMPACT = True

    interpret = jax.default_backend() == "cpu"
    S = 128
    report = {}
    t0 = time.time()

    def loss_of(out):
        # smooth functional mixing every differentiable product
        total = 0.0
        for i, k in enumerate(("alpha1", "alpha2", "depth", "tex")):
            total = total + jnp.sum(jnp.sin(out[k] * (0.7 + 0.1 * i)))
        return total

    scenes = [
        ("centered", make_scene(seed=0, b=2, n_faces=64), None),
        ("scattered", make_scene(seed=3, b=2, n_faces=48, scattered=True),
         None),
    ]
    # surface-texture mode: R=4 texel grid per face
    fv, st, ht = make_scene(seed=5, b=1, n_faces=32)
    surf = np.random.RandomState(9).rand(1, 32, 16, 3).astype(np.float32)
    scenes.append(("surface", (fv, st, ht), surf))

    for name, (fv, st, ht), surf in scenes:
        fv, st, ht = jnp.asarray(fv), jnp.asarray(st), jnp.asarray(ht)
        kw = {} if surf is None else {"surf_tex": jnp.asarray(surf)}

        dense = render_fused(fv, st, ht, S, backend="dense", **kw)
        pall = render_fused(fv, st, ht, S, backend="pallas",
                            interpret=interpret, **kw)
        # sigma=1e-4 coverage amplifies fma/order differences ~1e4 at
        # triangle edges, and Mosaic's fma contraction/exp differ from
        # XLA's dense lowering ON CHIP: measured v5e baselines are
        # tex/match <= 3.8e-3, depth <= 1.4e-2, alphas <= 4e-4 (interpret
        # mode on CPU is 100x tighter). Bounds sit ~30% above baseline;
        # a compile bug corrupts whole tiles, orders beyond these.
        # surface tex: texel-fold tie flips on ~0.9% of elements (measured)
        # are legitimate — tolerate <2% outliers there.
        ofrac = 0.02 if surf is not None else 0.0
        for k, atol in (("alpha1", 1e-3), ("alpha2", 1e-3), ("depth", 2e-2),
                        ("tex", 5e-3), ("match", 5e-3)):
            check(f"{name}/fwd/{k}", pall[k], dense[k], atol, report,
                  outlier_frac=ofrac if k == "tex" else 0.0)

        def lf(backend):
            def f(fv_, st_):
                out = render_fused(fv_, st_, ht, S, backend=backend,
                                   interpret=interpret, **kw)
                return loss_of(out)
            return f

        gd = jax.grad(lf("dense"), argnums=(0, 1))(fv, st)
        gp = jax.grad(lf("pallas"), argnums=(0, 1))(fv, st)
        for g_d, g_p, gname in ((gd[0], gp[0], "verts"),
                                (gd[1], gp[1], "soft_tex")):
            g_d, g_p = np.asarray(g_d), np.asarray(g_p)
            assert np.isfinite(g_p).all(), f"{name}/grad/{gname} non-finite"
            scale = np.abs(g_d).max() + 1e-8
            err = np.abs(g_p - g_d) / scale
            report[f"{name}/grad/{gname}"] = round(float(err.max()), 8)
            if surf is not None:
                # texel-tie flips move gradient mass too; measured CPU
                # baseline max rel err 1.8% — bound at 5% (corruption is
                # orders above)
                assert err.max() <= 5e-2, (
                    f"{name}/grad/{gname}: rel err {err.max()}")
            else:
                assert err.max() <= 5e-3, (
                    f"{name}/grad/{gname}: rel err {err.max()}")
        print(f"scene '{name}': fwd + grads OK")

    print(json.dumps({"parity_gate": "ok",
                      "backend": jax.default_backend(),
                      "interpret": interpret,
                      "image_size": S,
                      "seconds": round(time.time() - t0, 1),
                      "max_errs": report}))


if __name__ == "__main__":
    main()
