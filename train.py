#!/usr/bin/env python
"""Training entry point (reference train.py:28-46 counterpart).

Accepts the reference's flag set incl. --flagfile config files:
  python train.py --flagfile config/wild6d/laptop.txt --name exp1 \
      --dataset_path /path/to/Wild6D/laptop --total_iters 20000

Distributed init (NCCL process groups in the reference) is replaced by
jax.sharding over all visible TPU chips: set --num_devices N (defaults to 1).
"""
from __future__ import annotations

import sys

import numpy as np


def main(argv):
    from selfcorr_tpu.configs import parse_args
    cfg = parse_args(argv[1:])
    cfg = cfg.replace(train=True)
    if cfg.platform:
        import jax
        jax.config.update("jax_platforms", cfg.platform)
    if cfg.multihost or cfg.num_processes > 0:
        # multi-controller init, before any other jax use (the reference's
        # init_process_group, train.py:29-38). TPU pods: --multihost alone
        # (auto-detect); explicit clusters: + coordinator/num/process flags.
        from selfcorr_tpu.parallel import init_distributed
        init_distributed(cfg.coordinator_address or None,
                         cfg.num_processes or None,
                         cfg.process_id if cfg.process_id >= 0 else None)
    from selfcorr_tpu.utils.jit_cache import enable as _enable_cache
    _enable_cache()
    np.random.seed(cfg.seed)

    from selfcorr_tpu.train.loop import Trainer
    Trainer(cfg).train()


if __name__ == "__main__":
    main(sys.argv)
