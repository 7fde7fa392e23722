"""Verify the round-3 predict-FPS 'regression' attribution (VERDICT r3
weak #4): BENCH_r02 measured 522 FPS, BENCH_r03 498, with one earlier
round-3 reading of 538.7 — the drop was attributed to a transport window
but never verified. This runs bench.bench_predict THREE times back-to-back
in ONE process (each itself best-of-3 fetch-closed windows, 9 windows
total) plus the raw train step before/after, so window-to-window spread of
identical code is measured directly. If the spread covers 498..539, the
attribution holds; if the numbers are tight and low, the regression is
real and needs a kernel-level bisect.

Run solo on the TPU: python scripts/ab_predict_fps.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    import jax
    on_cpu = jax.default_backend() == "cpu"

    step0 = bench.bench_train_step(on_cpu)
    print(f"train step (before): {step0:.1f} imgs/s", flush=True)
    fps = []
    for i in range(3):
        t0 = time.time()
        f = bench.bench_predict(on_cpu)
        fps.append(f)
        print(f"predict run {i + 1}: {f:.1f} FPS "
              f"({time.time() - t0:.0f}s wall)", flush=True)
    step1 = bench.bench_train_step(on_cpu)
    print(f"train step (after): {step1:.1f} imgs/s", flush=True)
    print(json.dumps({
        "predict_fps_runs": [round(f, 1) for f in fps],
        "spread_pct": round(100 * (max(fps) - min(fps)) / max(fps), 1),
        "step_before": round(step0, 1), "step_after": round(step1, 1)}))


if __name__ == "__main__":
    main()
