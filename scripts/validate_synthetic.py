#!/usr/bin/env python
"""End-to-end learning validation on the asymmetric synthetic task.

Trains from scratch on procedural two-lobe ('duo') videos — rotationally
UNAMBIGUOUS, so the NOCS deg/cm buckets are exercised, not just IoU — with
the matching duo shape prior (identifiable canonical frame), then runs the
full eval pipeline (correspondence -> RANSAC-Umeyama fit -> exact 3D IoU +
deg/cm vs ray-tracer GT poses).

Ablations zero selected loss weights to show each term's contribution
(VERDICT r1 item 9):
  python scripts/validate_synthetic.py --iters 1000
  python scripts/validate_synthetic.py --iters 1000 --ablate match,imatch
  python scripts/validate_synthetic.py --iters 1000 --ablate cycle,cycle_pretrain

Results append to PERF.md's table by hand; the script prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ABLATABLE = {
    "match": "match_wt", "imatch": "imatch_wt", "cycle": "cycle_loss_wt",
    "cycle_pretrain": "cycle_loss_pretrain_wt", "tex": "tex_wt",
    "depth": "depth_wt", "symmetry": "symmetry_wt",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--ablate", type=str, default="",
                    help="comma list: " + ",".join(ABLATABLE))
    ap.add_argument("--platform", type=str, default="")
    ap.add_argument("--img_size", type=int, default=256)
    ap.add_argument("--name", type=str, default="")
    ap.add_argument("--out_dir", type=str, default="")
    ap.add_argument("--eval_only", action="store_true",
                    help="skip training; evaluate out_dir/<name>/ckpt")
    ap.add_argument("--freeze_prior", action="store_true",
                    help="prior_deform=False: anchor the canonical frame to "
                         "the duo prior (identifiable rotations)")
    ap.add_argument("--iters_eval_stride", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0,
                    help="synthetic instance-family seed (different seeds = "
                         "different object instances)")
    ap.add_argument("--vis_freq", type=int, default=10 ** 9,
                    help="TensorBoard image-panel cadence (exercises the "
                         "full vis path during long runs)")
    ap.add_argument("--save_freq", type=int, default=500)
    ap.add_argument("--eval_steps", type=str, default="",
                    help="comma list of retained checkpoint steps to eval "
                         "IN ADDITION to the final state — prints one JSON "
                         "line per step (metric trajectory)")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    metavar="KEY=VALUE",
                    help="generic Config override (repeatable), coerced to "
                         "the field's declared type — e.g. --set "
                         "dino_bf16=1 --set dino_flash=1 for arm A/Bs")
    ap.add_argument("--warm_start_path", type=str, default="",
                    help="orbax ckpt dir of a previous run: init the "
                         "encoder (backbone+featnet+stats) from it — the "
                         "in-sandbox analog of the reference's pretrained "
                         "ImageNet/DINO encoder (VERDICT r2 item 9)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from selfcorr_tpu.utils.jit_cache import enable as _enable_cache
    _enable_cache()

    import numpy as np
    import jax
    from selfcorr_tpu.configs import Config
    from selfcorr_tpu.data.synthetic import duo_prior_mesh
    from selfcorr_tpu.ops.mesh_ops import save_obj

    run_dir = args.out_dir or tempfile.mkdtemp(prefix="valsynth_")
    os.makedirs(run_dir, exist_ok=True)
    prior_path = os.path.join(run_dir, "duo_prior.obj")
    save_obj(prior_path, *duo_prior_mesh(2))

    name = args.name or ("duo"
                         + ("-frozen" if args.freeze_prior else "")
                         + ("-warm" if args.warm_start_path else "")
                         + (f"-seed{args.seed}" if args.seed else "")
                         + ("-" + args.ablate if args.ablate else ""))
    small = args.img_size <= 64
    cfg = Config(
        dataset_name="synthetic", synthetic_shape="duo",
        img_size=args.img_size,
        corr_h=args.img_size // 4, corr_w=args.img_size // 4,
        batch_size=8 if not small else 2, repeat=4 if not small else 2,
        total_iters=args.iters, learning_rate=1e-4,
        depth_offset=5.0, use_depth=True, divide_fn="both",
        pretrain_k=200 if not small else 8,
        codedim=64 if not small else 8,
        n_corr_feat=64 if not small else 16,
        symmetry_idx=-1,                 # asymmetric shape: no symmetry
        shape_prior=True, shape_prior_path=prior_path,
        prior_deform=not args.freeze_prior,
        mask_wt=0.15, tex_wt=0.05, depth_wt=0.1, triangle_wt=0.002,
        pullfar_wt=0.01, deform_wt=0.4, symmetry_wt=0.0, camera_wt=0.005,
        match_wt=0.02, imatch_wt=0.02, decay_ratio=0.1,
        cycle_loss_wt=0.01, cycle_loss_pretrain_wt=0.02,
        vert_lr_ratio=0.01, cam_lr_ratio=0.1,
        use_pallas=jax.default_backend() != "cpu",
        checkpoint_dir=run_dir, name=name,
        save_freq=args.save_freq, vis_freq=args.vis_freq,
        batch_log_interval=50,
        num_workers=4, seed=args.seed,
        warm_start_path=args.warm_start_path,
    )
    for key in [k for k in args.ablate.split(",") if k]:
        cfg = cfg.replace(**{ABLATABLE[key]: 0.0})
    if args.overrides:
        import dataclasses
        ftypes = {f.name: f.type for f in dataclasses.fields(cfg)}
        for kv in args.overrides:
            k, _, v = kv.partition("=")
            t = ftypes[k]  # KeyError on typos, by design
            cast = {("bool", bool): lambda s: s.lower() in ("1", "true"),
                    ("int", int): int, ("float", float): float,
                    ("str", str): str}
            fn = next((f for key, f in cast.items() if t in key), None)
            if fn is None:
                raise ValueError(
                    f"--set {k}: field type {t!r} is not overridable here "
                    "(only bool/int/float/str fields are)")
            cfg = cfg.replace(**{k: fn(v)})

    if not args.eval_only:
        from selfcorr_tpu.train.loop import Trainer
        trainer = Trainer(cfg)
        trainer.train()

    # ---- eval with the full NOCS pipeline against ray-tracer GT ----------
    ckpt_dir = os.path.join(run_dir, name, "ckpt")
    tcfg = cfg.replace(train=False, eval=True, eval_nocs=True,
                       batch_size=8 if not small else 4, repeat=1,
                       dframe_eval=2, model_path=ckpt_dir,
                       name=name + "-eval")
    from selfcorr_tpu.eval.tester import Tester

    tester = Tester(tcfg)
    # eval the TRAINING instances at held-out frames (validates the learned
    # pose/correspondence, not cross-instance generalization — from-scratch
    # training on 4 videos cannot show the latter)
    from selfcorr_tpu.data.synthetic import SyntheticTest
    dataset = SyntheticTest(tcfg, num_videos=4, frames_per_video=24,
                            seed=args.seed, shape="duo")
    import selfcorr_tpu.eval.tester as tester_mod
    from selfcorr_tpu.utils import checkpoint as ckpt_mod
    orig = tester_mod.make_test_dataset
    tester_mod.make_test_dataset = lambda c: dataset
    try:
        # metric trajectory over retained checkpoints (VERDICT r3 item 1:
        # does median_deg keep falling over the full recipe?)
        for s in [int(x) for x in args.eval_steps.split(",") if x]:
            tester.state = ckpt_mod.restore_state(ckpt_dir, tester.state,
                                                  step=s)
            r = tester.test()
            line = {"name": name, "iters": s, "trajectory": True,
                    **{k: round(float(v), 4) for k, v in r.items()}}
            print(json.dumps(line), flush=True)
            with open(os.path.join(run_dir, f"{name}-trajectory.jsonl"),
                      "a") as f:
                f.write(json.dumps(line) + "\n")
        if args.eval_steps:
            tester.state = ckpt_mod.restore_state(ckpt_dir, tester.state)
        results = tester.test()
    finally:
        tester_mod.make_test_dataset = orig

    iters = args.iters if not args.eval_only else int(
        np.asarray(tester.state.step))
    out = {"name": name, "iters": iters, "ablate": args.ablate,
           **{k: round(float(v), 4) for k, v in results.items()}}
    print(json.dumps(out))
    with open(os.path.join(run_dir, f"{name}-results.json"), "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
