"""Subprocess body for the multi-host (multi-controller) tests.

Run as: python tests/_mh_worker.py <mode> <rank> <nproc> <port> <tmpdir>
with mode in {utils, trainer}. Each process gets 2 virtual CPU devices, so
nproc=2 gives a 4-device global 'data' mesh split across two controllers —
the smallest real multi-host topology (cross-process collectives ride gloo
on CPU, ICI/DCN on pods; same jax program either way).

Must be a FILE (not stdin): jax.distributed and multiprocessing re-exec
need a real __main__ path.
"""
import os
import sys

# neutralize the repo conftest / sandbox env before jax configures itself
os.environ.pop("XLA_FLAGS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    mode, rank, nproc, port, tmpdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5])
    from selfcorr_tpu.parallel import (init_distributed, local_value,
                                       make_mesh, process_row_range,
                                       replicate, shard_batch)
    init_distributed(f"127.0.0.1:{port}", nproc, rank)
    assert jax.process_count() == nproc, jax.process_count()
    mesh = make_mesh()
    n_dev = len(jax.devices())

    if mode == "utils":
        import jax.numpy as jnp

        rows = 2 * n_dev
        full = np.arange(rows * 3, dtype=np.float32).reshape(rows, 3)
        r0, r1 = process_row_range(mesh, rows)
        with open(os.path.join(tmpdir, f"range_{rank}.txt"), "w") as f:
            f.write(f"{r0} {r1}")
        batch = shard_batch(mesh, {"x": full[r0:r1]})
        params = replicate(mesh, {"w": np.asarray([1.0, -2.0, 0.5],
                                                  np.float32)})

        def loss_fn(p, b):
            return jnp.mean(jnp.square(b["x"] @ p["w"]))

        loss, grad = jax.jit(jax.value_and_grad(loss_fn))(params, batch)
        got_loss = float(local_value(loss))
        got_grad = local_value(grad["w"])

        w = np.asarray([1.0, -2.0, 0.5], np.float32)
        y = full @ w
        want_loss = float(np.mean(y * y))
        want_grad = 2.0 * (full * y[:, None]).mean(0)
        assert abs(got_loss - want_loss) < 1e-4 * max(1.0, abs(want_loss)), \
            (got_loss, want_loss)
        np.testing.assert_allclose(got_grad, want_grad, rtol=1e-5)
        print(f"UTILS_OK rank={rank} range=({r0},{r1}) loss={got_loss:.6f}",
              flush=True)
        return

    if mode == "trainer":
        from selfcorr_tpu.configs import Config
        from selfcorr_tpu.train.loop import Trainer

        cfg = Config(img_size=32, corr_h=8, corr_w=8, subdivide=1,
                     batch_size=1, repeat=2, total_iters=2, train=True,
                     dataset_name="synthetic", use_depth=True,
                     divide_fn="both", pretrain_k=8, n_corr_feat=16,
                     codedim=8, use_pallas=False, num_devices=n_dev,
                     num_workers=2, batch_log_interval=1, save_freq=2,
                     vis_freq=10 ** 9, checkpoint_dir=tmpdir,
                     name=f"mh_trainer")
        Trainer(cfg).train()
        print(f"TRAINER_OK rank={rank}", flush=True)
        return

    if mode == "tester":
        import json
        from selfcorr_tpu.configs import Config
        from selfcorr_tpu.eval.tester import Tester

        cfg = Config(img_size=32, corr_h=8, corr_w=8, subdivide=1,
                     batch_size=4, repeat=1, train=False, eval=True,
                     eval_nocs=True, dataset_name="synthetic",
                     use_depth=True, pretrain_k=8, n_corr_feat=16,
                     codedim=8, use_pallas=False, num_devices=n_dev,
                     num_workers=2, dframe_eval=1, depth_offset=5.0,
                     pose_fit_max_points=256, checkpoint_dir=tmpdir,
                     name="mh_tester")
        tester = Tester(cfg)
        assert tester.row_range is not None
        results = tester.test()
        with open(os.path.join(tmpdir, f"tester_{rank}.json"), "w") as f:
            json.dump(results, f)
        print(f"TESTER_OK rank={rank} range={tester.row_range} "
              f"count={results['count']}", flush=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
