"""On-chip A/B of the face-sort y-band count for the lane-split tile
geometry (pallas_raster.bands_for).

The cost model (scripts/analyze_face_sort.py) predicts that with 16x64
lane-split tiles the 64-band sort is stale: narrow tiles make the chunk
cull x-limited, and coarser 16-px bands let the x-minor sort term group
each chunk x-tight instead of splitting it across 4-px micro-bands
(predicted 0.79x ico / 0.71x scattered bbox-level pair work at 256^2).
This measures it: bench_raster's two scenes, fwd and fwd+bwd, bands
16 vs 64 vs 32, A-B-A in one process/transport session.

The band count only permutes the face order (kernel semantics are
face-order invariant, pinned by tests/test_raster_pallas.py), so this is
purely a performance knob.

Run solo on the TPU: python scripts/ab_face_sort_bands.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    import jax
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P
    from scripts.bench_raster import scattered_scene, ico_scene, bench

    arms = [("bands=16", 16), ("bands=64 (classic)", 64), ("bands=32", 32),
            ("bands=16 (recheck)", 16)]
    scenes = [("scattered", scattered_scene()), ("ico", ico_scene())]
    for tag, n in arms:
        P.bands_for = lambda s, n=n: n
        jax.clear_caches()
        print(f"--- {tag} ---")
        for name, (fv, tex) in scenes:
            bench(f"{name} {tag}", fv, tex)


if __name__ == "__main__":
    main()
