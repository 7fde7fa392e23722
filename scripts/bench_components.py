"""Per-component timings of the flagship train step (PERF.md breakdown).

Isolates each hot block fwd(+bwd) at the flagship Wild6D-laptop shapes so
the optimization budget targets the real bottleneck. Timing follows
scripts/bench_raster.py's chained-fetch discipline: on the tunneled axon
backend block_until_ready does NOT sync (only value fetches do), so each
iteration chains through its predecessor and intervals end with one scalar
fetch; best of 3 intervals amortizes tunnel hiccups.

Run solo on the TPU: python scripts/bench_components.py [component ...]
Components: symmetry dino encoder corr transport step base  (default: all)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def time_chained(step, x0, iters=20, intervals=3):
    x = step(x0)
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))
    best = float("inf")
    for _ in range(intervals):
        t0 = time.time()
        for _ in range(iters):
            x = step(x)
        float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))
        best = min(best, (time.time() - t0) / iters * 1000)
    return best


def _cfg():
    import bench
    return bench.flagship_cfg(on_cpu=False)


def bench_symmetry():
    from selfcorr_tpu.losses.regularizers import symmetry_loss
    from selfcorr_tpu.ops.geometry import symmetry_rotations

    rng = np.random.RandomState(0)
    b, v = 32, 642
    from selfcorr_tpu.ops.mesh_ops import icosphere
    verts, faces = icosphere(3)
    pred_v = jnp.asarray(np.tile(verts[None], (b, 1, 1)).astype(np.float32)
                         + rng.randn(b, v, 3).astype(np.float32) * 0.01)
    faces = jnp.asarray(faces.astype(np.int32))
    rots = jnp.asarray(symmetry_rotations(1))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def f(pv):
        l, g = jax.value_and_grad(
            lambda p: symmetry_loss(key, p, faces, rots, 10000))(pv)
        return pv + 1e-30 * (l + g.mean())

    t = time_chained(f, pred_v)
    print(f"symmetry fwd+bwd (B=32, k=2, V=642, S=10k): {t:.1f} ms")


def bench_dino():
    from selfcorr_tpu.models.vit import DinoViTS8
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(32, 256, 256, 3).astype(np.float32))
    dino = DinoViTS8()
    params = dino.init(jax.random.PRNGKey(0), img[:1])["params"]

    @jax.jit
    def f(x):
        y = dino.apply({"params": params}, x)
        return x + 1e-30 * y.mean()

    t = time_chained(f, img, iters=10)
    print(f"dino fwd (B=32, 256^2): {t:.1f} ms")


def bench_encoder():
    from selfcorr_tpu.models.meshnet import Networks
    cfg = _cfg()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(32, 256, 256, 3).astype(np.float32))
    net = Networks(cfg)
    vs = net.init(jax.random.PRNGKey(0), img[:1], method="encode_img")

    @jax.jit
    def f(x):
        def loss(p):
            (code, feat), _ = net.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, True,
                method="encode_img", mutable=["batch_stats"])
            return code.mean() + feat.mean()
        l, g = jax.value_and_grad(loss)(vs["params"])
        gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g))
        return x + 1e-30 * (l + gsum)

    t = time_chained(f, img, iters=10)
    print(f"encoder fwd+bwd (B=32, 256^2): {t:.1f} ms (x2 in step: cycle re-encode)")


def bench_corr():
    from selfcorr_tpu.models import correspondence as corr
    cfg = _cfg()
    rng = np.random.RandomState(0)
    b, p, v, c = 32, cfg.corr_h * cfg.corr_w, 642, cfg.n_corr_feat
    img_feat = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    mesh_feat = jnp.asarray(rng.randn(b, v, c).astype(np.float32))
    mask = jnp.ones((b, 256, 256), jnp.float32)
    pred_v = jnp.asarray(rng.randn(b, v, 3).astype(np.float32))
    meshgrid = corr.make_meshgrid(cfg.corr_h, cfg.corr_w)

    @jax.jit
    def f(x):
        def loss(x):
            pc, mm, im, _ = corr.dual_softmax_match(
                x, mesh_feat, mask, pred_v, meshgrid,
                cfg.tau_img, cfg.tau_mesh, cfg.corr_h, cfg.corr_w)
            return pc.mean() + mm.mean() + im.mean()
        l, g = jax.value_and_grad(loss)(x)
        return x + 1e-30 * (l + g.mean())

    t = time_chained(f, img_feat)
    print(f"correspondence volumes fwd+bwd (B=32): {t:.1f} ms")


def bench_transport():
    """DINO cycle transport fwd+bwd at flagship pair shapes (B=64 pairs,
    P=4096, N=642, k=100): dense reference transcription vs the factored
    form (correspondence.dino_cycle_loss docstring). Grad wrt the model's
    image features — the transport's differentiable input in the step."""
    from selfcorr_tpu.models import correspondence as corr
    from selfcorr_tpu.ops.image_ops import resize_nearest
    cfg = _cfg()
    rng = np.random.RandomState(0)
    b, hf, wf, v, c = 64, cfg.corr_h, cfg.corr_w, 642, cfg.n_corr_feat
    k, cd = cfg.pretrain_k, 384
    h2w2 = (hf // 2) * (wf // 2)
    feats = tuple(jnp.asarray(rng.randn(b, h2w2, cd).astype(np.float32))
                  for _ in range(2))
    masks = tuple(jnp.asarray((rng.rand(b, 256, 256) > 0.4)
                              .astype(np.float32)) for _ in range(2))
    dws = tuple(jnp.asarray(rng.rand(b, v).astype(np.float32))
                for _ in range(2))
    ifs = tuple(jnp.asarray(rng.randn(b, hf * wf, c).astype(np.float32))
                for _ in range(2))
    mfs = tuple(jnp.asarray(rng.randn(b, v, c).astype(np.float32))
                for _ in range(2))
    meshgrid = corr.make_meshgrid(hf, wf)

    @jax.jit
    def f_fact(x):
        def loss(x):
            l, _ = corr.dino_cycle_loss(
                feats, masks, dws, (x, ifs[1]), mfs, meshgrid,
                cfg.tau_img, cfg.tau_mesh, hf, wf, k)
            return l
        l, g = jax.value_and_grad(loss)(x)
        return x + 1e-30 * (l + g.mean())

    @jax.jit
    def f_dense(x):
        def loss(x):
            pcs = []
            for side, imf in enumerate((x, ifs[1])):
                md = resize_nearest(
                    masks[side][..., None], (hf, wf)).reshape(b, -1)
                pcs.append(corr.masked_cost_volume(imf, mfs[side], md))
            l, _ = corr.dino_cycle_loss_dense(
                feats, masks, dws, tuple(pcs), meshgrid,
                cfg.tau_img, cfg.tau_mesh, hf, wf, k)
            return l
        l, g = jax.value_and_grad(loss)(x)
        return x + 1e-30 * (l + g.mean())

    print(f"dino transport factored fwd+bwd (B=64): "
          f"{time_chained(f_fact, ifs[0], iters=10):.1f} ms")
    try:
        print(f"dino transport dense    fwd+bwd (B=64): "
              f"{time_chained(f_dense, ifs[0], iters=10):.1f} ms")
    except Exception as e:  # the dense oracle's (B,P,Q) program exceeds the
        # tunneled remote-compile upload limit (HTTP 413) at flagship shapes;
        # it exists only as the correctness oracle (tests run it small)
        print(f"dino transport dense: skipped ({type(e).__name__}: "
              f"{str(e)[:80]})")


def bench_step():
    import bench
    t0 = time.time()
    ips = bench.bench_train_step(on_cpu=False)
    print(f"full train step: {32.0 / ips * 1000:.1f} ms ({ips:.1f} imgs/s)")


def bench_dinoparts():
    """Decompose the frozen DINO trunk's cost: full vs attention-ablated vs
    MLP-ablated vs bf16-cast attention (cast q/k/v only — tensors at rest
    stay f32, unlike the rejected whole-trunk dino_bf16 cast). Ablated arms
    use fresh random params (timing-only; the trunk cost is shape-driven)."""
    import selfcorr_tpu.models.vit as vit

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(32, 256, 256, 3).astype(np.float32))
    orig_attn = jax.nn.dot_product_attention
    orig_mlp = vit.Mlp

    class ZeroMlp(vit.nn.Module):
        hidden: int
        out: int

        @vit.nn.compact
        def __call__(self, x):
            return jnp.zeros_like(x)

    def bf16_attn(q, k, v, **kw):
        y = orig_attn(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                      v.astype(jnp.bfloat16), **kw)
        return y.astype(jnp.float32)

    arms = [
        ("full trunk", orig_attn, orig_mlp),
        ("attention -> v (qkv/proj kept)", lambda q, k, v, **kw: v, orig_mlp),
        ("mlp -> 0", orig_attn, ZeroMlp),
        ("attention in bf16 (cast q/k/v)", bf16_attn, orig_mlp),
    ]
    for name, attn, mlp in arms:
        jax.nn.dot_product_attention = attn
        vit.Mlp = mlp
        try:
            dino = vit.DinoViTS8()
            params = dino.init(jax.random.PRNGKey(0), img[:1])["params"]

            @jax.jit
            def f(x):
                y = dino.apply({"params": params}, x)
                return x + 1e-30 * y.mean()

            t = time_chained(f, img, iters=10)
            print(f"dino trunk fwd (B=32) [{name}]: {t:.1f} ms")
        finally:
            jax.nn.dot_product_attention = orig_attn
            vit.Mlp = orig_mlp


ALL = dict(symmetry=bench_symmetry, dino=bench_dino, encoder=bench_encoder,
           corr=bench_corr, transport=bench_transport, step=bench_step,
           dinoparts=bench_dinoparts)

def bench_base():
    """The non-model step residuals: optimizer update (clip + 5-group
    AdamW over the full param tree), mask pyramid loss, and preprocess
    (jitter + normalize) — the 'base' ~60 ms the ablation matrix cannot
    subtract (PERF.md round-3)."""
    import bench
    from selfcorr_tpu.models.meshnet import (build_mesh_constants, preprocess)
    from selfcorr_tpu.train.optim import make_optimizer, clip_and_guard
    from selfcorr_tpu.train.step import init_state
    from selfcorr_tpu.losses import mask_pyramid_loss

    cfg = _cfg()
    constants = build_mesh_constants(cfg)
    state = init_state(cfg, constants, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, state.params)
    opt_state = tx.init(state.params)
    grads = jax.tree_util.tree_map(lambda x: x * 1e-3, state.params)

    @jax.jit
    def f_opt(params):
        g, norms, bad = clip_and_guard(grads)
        updates, _ = tx.update(g, opt_state, params)
        import optax
        new = optax.apply_updates(params, updates)
        return new

    t = time_chained(f_opt, state.params, iters=10)
    print(f"optimizer update (clip + AdamW, full tree): {t:.1f} ms")

    rng = np.random.RandomState(0)
    mask = jnp.asarray((rng.rand(32, 256, 256) > 0.5).astype(np.float32))
    render = jnp.asarray(rng.rand(32, 256, 256).astype(np.float32))

    @jax.jit
    def f_pyr(render):
        l, g = jax.value_and_grad(
            lambda r: mask_pyramid_loss(mask, r, None).mean())(render)
        return render + 1e-30 * (l + g.mean())

    print(f"mask pyramid fwd+bwd (B=32): {time_chained(f_pyr, render, iters=10):.1f} ms")

    img = jnp.asarray(rng.rand(32, 256, 256, 3).astype(np.float32))

    @jax.jit
    def f_pre(img):
        y = preprocess(jax.random.PRNGKey(0), img, True)
        return img + 1e-30 * y.mean()

    print(f"preprocess jitter+normalize (B=32): {time_chained(f_pre, img, iters=10):.1f} ms")

    from selfcorr_tpu.train.step import compress_batch_host, decompress_batch
    cbatch = {k: jnp.asarray(v) for k, v in
              compress_batch_host(jax.tree_util.tree_map(
                  np.asarray, bench.synth_batch(32, 256))).items()}

    @jax.jit
    def f_dec(img_u8):
        out = decompress_batch(dict(cbatch, img=img_u8))
        return img_u8 + (1e-30 * sum(v.mean() for v in out.values())
                         ).astype(jnp.uint8)

    print(f"in-graph u8/u16 batch decompress (B=32): "
          f"{time_chained(f_dec, cbatch['img'], iters=10):.1f} ms")


ALL["base"] = bench_base


if __name__ == "__main__":
    from selfcorr_tpu.utils.jit_cache import enable
    enable()
    names = sys.argv[1:] or list(ALL)
    for n in names:
        ALL[n]()
