"""Train-step A/B of the rasterizer lane-split tile geometry
(pallas_raster.LANE_SPLIT): 16x64-pixel tiles packed one per vreg vs the
classic 8x128 row strips.

The raster microbench (bench_raster.py) showed the split wins on the
mesh-coherent ico scene (fwd+bwd 123.8 -> 111.8 ms) but loses on the
scattered soup (170.9 -> 197.5 ms); the training distribution is
mesh-coherent, so the decider is the full raw train step, measured
A-B-A in ONE process/transport session (same discipline as
ab_step_arms.py). LANE_SPLIT is a module flag the jitted wrappers do not
key on, so each flip clears the jit caches (the persistent compile cache
keeps recompiles cheap).

Run solo on the TPU: python scripts/ab_lane_split.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    import jax
    from bench import flagship_cfg
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P
    from scripts.ab_step_arms import time_step

    arms = [("split-on", True), ("split-off", False),
            ("split-on(recheck)", True)]
    results = {}
    for tag, flag in arms:
        P.LANE_SPLIT = flag
        jax.clear_caches()
        cfg = flagship_cfg(on_cpu=False)
        results[tag], loss = time_step(cfg, tag)

    print("\n=== summary (raw train step, B=32 @ 256^2) ===")
    for tag, _ in arms:
        print(f"{tag:20s} {results[tag]:7.1f} imgs/s")


if __name__ == "__main__":
    main()
