"""A/B the end-to-end Trainer loop: host loader + H2D upload vs on-device
synthetic generation (VERDICT r4 follow-on; PERF.md round 4). One process,
one transport session, A-B-A. Run solo on the TPU."""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(tag, **kw):
    from bench import flagship_cfg
    from selfcorr_tpu.train.loop import Trainer

    run_dir = tempfile.mkdtemp(prefix=f"ab_devsynth_{tag}_")
    cfg = flagship_cfg(
        on_cpu=False, dataset_name="synthetic", total_iters=40,
        batch_log_interval=10, checkpoint_dir=run_dir, name="ab",
        save_freq=10 ** 9, vis_freq=10 ** 9, num_workers=8, **kw)
    t = Trainer(cfg)
    t.train()
    print(f"[{tag}] loop best {t.last_imgs_per_sec:.1f} / median "
          f"{t.median_imgs_per_sec:.1f} imgs/s", flush=True)


def main():
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    for tag, kw in [("host-loader", {}),
                    ("on-device", {"synthetic_on_device": True}),
                    ("host-loader2", {})]:
        run(tag, **kw)


if __name__ == "__main__":
    main()
