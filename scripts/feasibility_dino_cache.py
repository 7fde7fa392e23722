"""Feasibility measurement for a host-side DINO feature cache (VERDICT r4
item 8 — explicitly 'measure feasibility against the transport-leak
constraint BEFORE building').

The idea: the frozen DINO trunk is ~57 ms of every train step
(BENCH roofline, dino_trunk_fwd), and on real data the 20k-iter plan
revisits frames, so features keyed by (video, frame) could be computed once
and served from a host cache. Two facts decide viability:

1. SEMANTICS — the trunk consumes the per-visit randomly-scaled crop
   (data loaders draw crop scale U[1.2, 1.5] per sample, mirroring the
   reference dataset_wild6d.py augmentation; meshnet.py builds dino_feat
   from that crop). Features are therefore NOT a pure function of
   (video, frame): an exact cache needs either a canonical crop for the
   DINO branch (a reference deviation) or full-raw-frame features resampled
   to the crop window in feature space (bilinear over the 8-px token grid).

2. TRANSPORT — serving cached features means re-introducing per-step H2D
   traffic (keys (B, 1024, 384) bf16 ~= 0.75 MB/frame, ~24 MB per 32-frame
   batch) on exactly the tunneled transport whose per-transfer leak and
   hiccups round 4 worked to ELIMINATE (on-device synth: 140 imgs/s vs the
   host path's 31-127). This script measures that upload against the 57 ms
   on-chip recompute it would replace.

Run SOLO on the TPU: python scripts/feasibility_dino_cache.py
Prints one JSON line; conclusion goes to PERF.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    import jax
    import jax.numpy as jnp

    b, tokens, dim = 32, 32 * 32, 384  # flagship batch, ViT-S/8 @ 256^2
    feats = np.random.rand(b, tokens, dim).astype(np.float32)
    feats_bf16 = jax.device_get(jnp.asarray(feats, jnp.bfloat16))
    mb = feats_bf16.size * 2 / 1e6

    # chained H2D upload timing: each upload's completion gates the next
    # via a scalar fetch (block_until_ready lies on axon — CLAUDE.md)
    @jax.jit
    def touch(x):
        return x.astype(jnp.float32).sum()

    float(touch(jnp.asarray(feats_bf16)))  # compile + warm
    times = []
    for _ in range(12):
        t0 = time.time()
        dev = jnp.asarray(feats_bf16)      # H2D of one batch of features
        float(touch(dev))                  # fetch closes the window
        times.append(time.time() - t0)
    up_best, up_med = min(times), float(np.median(times))

    # the recompute it would replace: the measured trunk forward
    from bench import flagship_cfg, synth_batch
    from selfcorr_tpu.models.vit import DinoViTS8
    import flax

    cfg = flagship_cfg(on_cpu=False)
    batch = synth_batch(b, cfg.img_size)
    img = jnp.asarray(batch["img"])
    dino = DinoViTS8()
    params = dino.init(jax.random.PRNGKey(0), img[:1])["params"]

    @jax.jit
    def trunk(p, x):
        return DinoViTS8().apply({"params": p}, x)

    out = trunk(params, img)
    float(out.sum())
    times = []
    for _ in range(6):
        t0 = time.time()
        float(trunk(params, img).sum())
        times.append(time.time() - t0)
    fwd_best, fwd_med = min(times), float(np.median(times))

    verdict = ("cache_viable" if up_med < 0.8 * fwd_med
               else "recompute_wins_on_tunnel")
    print(json.dumps({
        "feature_mb_per_batch32": round(mb, 1),
        "h2d_upload_ms": {"best": round(up_best * 1e3, 1),
                          "median": round(up_med * 1e3, 1)},
        "trunk_fwd_ms": {"best": round(fwd_best * 1e3, 1),
                         "median": round(fwd_med * 1e3, 1)},
        "verdict": verdict,
        "note": "crop-jitter semantics additionally require feature-space "
                "resampling for an exact (video,frame) cache; see docstring",
    }))


if __name__ == "__main__":
    main()
