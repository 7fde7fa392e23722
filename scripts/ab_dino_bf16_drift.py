"""Numerics probe for the whole-trunk bf16 DINO cast (adoption gate for the
round-4 bf16+pad_once timing arm, scripts/ab_step_arms.py bf16).

The frozen DINO features are a stop-gradient'd TARGET of the pretrained
cycle loss (meshnet.py forward_train -> corr.dino_cycle_loss): bf16 drift
perturbs the loss landscape's target, not gradient stability, so the
question is HOW FAR the matching that consumes the features moves. This
probe measures, on the torch-fixture weights (tests/fixtures, the same
weights the converter round-trips):
  1. feature drift: max-rel and median-rel ||f_bf16 - f_f32|| / ||f_f32||
  2. MATCHING drift: the fraction of argmax correspondences (over the
     key-feature dot-product volume, the quantity dino_pair_match actually
     consumes) that change winner between f32 and bf16 trunks.
CPU, interpret-free (pure XLA). Run: python scripts/ab_dino_bf16_drift.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    from selfcorr_tpu.models.vit import DinoViTS8

    rng = np.random.RandomState(0)
    b, s = 2, 256
    img = jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32))

    dino = DinoViTS8()
    params = dino.init(jax.random.PRNGKey(0), img)["params"]

    f32 = dino.apply({"params": params}, img)
    pbf = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    fbf = dino.apply({"params": pbf}, img.astype(jnp.bfloat16))
    fbf = fbf.astype(jnp.float32)

    a = np.asarray(f32).reshape(b, -1, f32.shape[-1])
    c = np.asarray(fbf).reshape(b, -1, f32.shape[-1])
    rel = np.linalg.norm(a - c, axis=-1) / (np.linalg.norm(a, axis=-1) + 1e-8)
    print(f"feature drift: max-rel {rel.max():.4f} "
          f"median-rel {np.median(rel):.4f}")

    # matching drift: argmax over the dot-product volume between the two
    # batch halves (what dino_pair_match consumes after normalization)
    an = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    cn = c / (np.linalg.norm(c, axis=-1, keepdims=True) + 1e-8)
    vol32 = an[0] @ an[1].T
    volbf = cn[0] @ cn[1].T
    m32 = vol32.argmax(-1)
    mbf = volbf.argmax(-1)
    flip = (m32 != mbf).mean()
    print(f"argmax correspondence flips: {flip * 100:.2f}% "
          f"({(m32 != mbf).sum()}/{m32.size})")
    # flips between near-ties are inconsequential (the transport that
    # consumes the volume is a SOFT dual-softmax; only dino_pair_match's
    # top-k uses argmax) — report the f32 similarity a flip gives up
    idx = np.nonzero(m32 != mbf)[0]
    if idx.size:
        gap = vol32[idx, m32[idx]] - vol32[idx, mbf[idx]]
        print(f"flip similarity gap (f32 units): max {gap.max():.5f} "
              f"median {np.median(gap):.5f} "
              f"(vol32 dynamic range {vol32.min():.3f}..{vol32.max():.3f})")
    print("note: random-init trunk — real-weight drift is typically LOWER "
          "(trained attention is less ill-conditioned than random), same "
          "caveat as the dino_attn_bf16 measurement (configs.py).")


if __name__ == "__main__":
    main()
