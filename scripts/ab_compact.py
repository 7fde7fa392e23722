"""Rasterizer face-compaction A/B (pallas_raster.COMPACT): per-tile
gathered live-face groups vs the dense 16-face chunk stream.

Two levels, one process/transport session each way:
  1. kernel microbench (bench_raster scenes, fwd and fwd+bwd) — the
     compaction model predicts 0.65x pair work on the mesh-coherent ico
     scene and 0.34x on the scattered soup (scripts/analyze_tile_waste.py
     + compaction extension, PERF.md round 5);
  2. the FULL raw train step, A-B-A (the decider, same discipline as
     ab_lane_split.py / ab_step_arms.py).

COMPACT is threaded to the jitted wrappers as a static arg via
compact_for(), but an outer-jit user (the train step) still needs a cache
clear per flip — same convention as LANE_SPLIT.

Run solo on the TPU: python scripts/ab_compact.py [--step-only|--micro-only]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def micro():
    import jax
    from scripts.bench_raster import bench, scattered_scene, ico_scene
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P

    for tag, flag in [("chunked", False), ("compact", True)]:
        P.COMPACT = flag
        jax.clear_caches()
        for name, fn in [("scattered", scattered_scene), ("ico", ico_scene)]:
            fv, tex = fn()
            bench(f"[micro] {tag} {name}", fv, tex)


def step_ab():
    import jax
    from bench import flagship_cfg
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P
    from scripts.ab_step_arms import time_step

    arms = [("compact-on", True), ("compact-off", False),
            ("compact-on(recheck)", True)]
    results = {}
    for tag, flag in arms:
        P.COMPACT = flag
        jax.clear_caches()
        cfg = flagship_cfg(on_cpu=False)
        results[tag], loss = time_step(cfg, tag)
    print("\n=== summary (raw train step, B=32 @ 256^2) ===")
    for tag, _ in arms:
        print(f"{tag:20s} {results[tag]:7.1f} imgs/s")


def main():
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    if "--step-only" not in sys.argv:
        micro()
    if "--micro-only" not in sys.argv:
        step_ab()


if __name__ == "__main__":
    main()
