"""On-chip A/B of the backward-kernel pixel-reduction strategies
(pallas_raster.MXU_REDUCE): VPU sublane-first two-step reduces vs one
batched MXU matmul against the [1, x] pixel basis.

Both arms run in ONE process and transport session at the bench_raster
scenes/shapes, interleaved A-B-A so transport drift cannot masquerade as a
kernel effect. Equivalence is pinned by tests/test_raster_pallas.py
(interpret) and the on-chip parity gate; this script only times.

Run solo on the TPU: python scripts/ab_bwd_reduce.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    from selfcorr_tpu.ops.rasterizer import pallas_raster as P
    from bench_raster import scattered_scene, ico_scene, bench

    scenes = [("scattered B=32 F=1280", scattered_scene()),
              ("icosphere B=32 F=1280", ico_scene())]
    for arm in (False, True, False):
        P.MXU_REDUCE = arm
        tag = "mxu" if arm else "vpu"
        print(f"--- arm: {tag} ---", flush=True)
        for name, (fv, tex) in scenes:
            bench(f"{tag} {name}", fv, tex)


if __name__ == "__main__":
    # bench_raster self-locates the repo; import it as a module from scripts/
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
