#!/usr/bin/env python
"""Inference / evaluation entry point (reference predict.py:30-49).

  python predict.py --flagfile config/wild6d/laptop.txt --test \
      --model_path log/exp1/ckpt --eval --eval_nocs \
      --test_dataset_path /path/to/Wild6D/test_set/laptop

--model_path accepts either an orbax checkpoint dir or a reference
pred_net_*.pth (converted on load).
"""
from __future__ import annotations

import sys

import numpy as np


def main(argv):
    from selfcorr_tpu.configs import parse_args
    cfg = parse_args(argv[1:])
    cfg = cfg.replace(train=False)
    if cfg.platform:
        import jax
        jax.config.update("jax_platforms", cfg.platform)
    from selfcorr_tpu.utils.jit_cache import enable as _enable_cache
    _enable_cache()
    np.random.seed(cfg.seed)

    from selfcorr_tpu.eval.tester import Tester
    Tester(cfg).test()


if __name__ == "__main__":
    main(sys.argv)
