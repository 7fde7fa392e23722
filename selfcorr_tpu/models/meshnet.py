"""MeshNet: full model composition + training/eval forwards (functional).

TPU-first re-design of the reference's MeshNet (model/model.py:42-151) and its
module graph (encoder.py, mesh.py, renderer.py): flax modules hold only the
neural nets; the canonical mesh, rendering, correspondence and loss assembly
are pure functions so the entire training step jits into one XLA program
(no per-iteration host work — the reference syncs the host every step for
grad collection and logging, trainer.py:132-150).

The learnable canonical shape `mean_v` lives beside the flax params in the
train state ({"net": ..., "mean_v": ...}) so the optimizer can address it as
its own parameter group (optimizers.py:17-36).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from selfcorr_tpu.configs import Config
from selfcorr_tpu.losses import (
    mask_pyramid_loss, texture_loss, depth_loss,
    laplacian_loss, flatten_loss, symmetry_loss, pullfar_loss, deform_loss,
    camera_loss, match_loss, imatch_loss,
)
from selfcorr_tpu.losses.match_losses import DIVIDE_FNS
from selfcorr_tpu.models import correspondence as corr
from selfcorr_tpu.models.heads import PosePredictor, ShapeDeformer
from selfcorr_tpu.models.pointnet import MeshEncoder
from selfcorr_tpu.models.resnet import ResNet18, FPNDecoder
from selfcorr_tpu.models.vit import DinoViTS8, flash_attention_available
from selfcorr_tpu.ops import geometry as G
from selfcorr_tpu.ops import mesh_ops as M
from selfcorr_tpu.ops.image_ops import color_jitter, grid_sample
from selfcorr_tpu.ops.rasterizer import render_fused
from selfcorr_tpu.ops.rasterizer.common import EYE_OFFSET

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class MeshConstants(NamedTuple):
    """Static per-category constants, built host-side once (mesh.py:64-118)."""
    mean_v_init: np.ndarray   # (V, 3)
    faces: np.ndarray         # (F, 3) int32
    symm_rots: np.ndarray     # (k, 3, 3)
    laplacian: np.ndarray     # (V, V)
    flatten_quads: tuple      # 4 x (E,) int32
    base_rot: np.ndarray      # (3, 3)


def build_mesh_constants(cfg: Config) -> MeshConstants:
    if cfg.shape_prior and cfg.shape_prior_path:
        verts, faces = M.load_obj(cfg.shape_prior_path)
        verts = M.normalize_prior(verts, cfg.init_scale)
    else:
        verts, faces = M.icosphere(cfg.subdivide)
        verts = verts * np.asarray(cfg.init_scale)
    verts = verts.astype(np.float32)
    faces = faces.astype(np.int32)
    return MeshConstants(
        mean_v_init=verts,
        faces=faces,
        symm_rots=G.symmetry_rotations(cfg.symmetry_idx),
        laplacian=M.laplacian_matrix(len(verts), faces),
        flatten_quads=M.flatten_quads(faces),
        base_rot=G.base_rotation(cfg.base_rot),
    )


class Networks(nn.Module):
    """All trainable nets (reference Encoder, encoder.py:13-52)."""
    cfg: Config

    def setup(self):
        c = self.cfg
        self.backbone = ResNet18()
        self.featnet = FPNDecoder(out_channels=c.n_corr_feat,
                                  downsample=c.img_size // c.corr_h)
        self.featnet_mesh = MeshEncoder(c.n_corr_feat)
        self.shape_code_predictor = nn.Dense(c.codedim)
        self.shape_predictor = ShapeDeformer(
            code_dim=c.codedim, deform_ratio=c.deform_ratio,
            no_deform=c.no_deform)
        self.pose_predictor = PosePredictor(
            rotation_offset=tuple(c.rotation_offset),
            depth_offset=c.depth_offset, use_scale=c.use_scale)

    def encode_img(self, img, train: bool = True):
        """img: (B,H,W,3) ALREADY jittered+ImageNet-normalized.
        Returns (img_code (B,512), img_feat (B, P, C) L2-normalized)."""
        b = img.shape[0]
        feats = self.backbone(img, train)
        img_code = feats[-1].mean(axis=(1, 2))
        img_feat = self.featnet(feats, train)
        img_feat = img_feat.reshape(b, -1, self.cfg.n_corr_feat)
        img_feat = G.normalize(img_feat, axis=-1)
        return img_code, img_feat

    def __call__(self, img, mean_v, pp_crop, foc_crop, train: bool = True):
        img_code, img_feat = self.encode_img(img, train)
        shape_code = self.shape_code_predictor(img_code)
        pred_v = self.shape_predictor(mean_v, shape_code)

        mesh_feat = self.featnet_mesh(jax.lax.stop_gradient(pred_v))
        mesh_feat = G.normalize(mesh_feat, axis=-1)

        rotation, trans, scale = self.pose_predictor(img_code)
        pred_v = pred_v * scale[:, None, :]
        # principal-point compensation (encoder.py:49): shift xy so the
        # predicted z is depth along the crop's optical axis
        tz = jax.lax.stop_gradient(trans[:, 2:])
        txy = trans[:, :2] - (pp_crop / foc_crop) * tz
        translation = jnp.concatenate([txy, trans[:, 2:]], -1)[:, None, :]
        return img_feat, mesh_feat, pred_v, rotation, translation, scale


def preprocess(key, img, train: bool):
    """ColorJitter + ImageNet normalize (encoder.py:18-19,31). The reference
    applies the jitter in eval mode too (torchvision transforms are
    mode-agnostic) — parity kept."""
    x = color_jitter(key, img)
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def weights_schedule(step, cfg: Config):
    """Per-iteration loss-weight schedule (weights.py:21-64): decreasing for
    regularizers/cycle, increasing for match/imatch, linear toward
    decay_ratio x base."""
    frac = jnp.clip(step / cfg.total_iters, 0.0, 1.0)

    def down(w):
        return frac * (cfg.decay_ratio * w - w) + w

    def up(w):
        return frac * (w - cfg.decay_ratio * w) + cfg.decay_ratio * w

    return dict(
        mask=cfg.mask_wt, tex=cfg.tex_wt, depth=cfg.depth_wt,
        triangle=down(cfg.triangle_wt), symmetry=down(cfg.symmetry_wt),
        cycle=down(cfg.cycle_loss_wt), cycle_pt=down(cfg.cycle_loss_pretrain_wt),
        match=up(cfg.match_wt), imatch=up(cfg.imatch_wt),
        pullfar=cfg.pullfar_wt, deform=cfg.deform_wt, camera=cfg.camera_wt,
    )


def render_products(pred_v, faces, tex, foc_crop, pp_crop, rotation,
                    translation, cfg: Config, use_pallas: bool | None = None,
                    surf_tex=None):
    """Camera transform + fused rasterization + analytic imatch_gt and
    per-vertex visibility weights (renderer.py:38-73). surf_tex (B,F,R^2,3)
    switches the texture pass to per-face texel grids ('surface' mode)."""
    verts_cam = G.rigid_transform(pred_v, rotation, translation)
    proj = G.project_ndc(verts_cam, pp_crop, foc_crop, flip_y=True)
    rast = proj.at[..., 2].add(EYE_OFFSET)

    fv = rast[:, faces]                                    # (B,F,3,3)
    soft_tex = tex[:, faces]                               # (B,F,3,3)
    hard_tex = jax.lax.stop_gradient(pred_v)[:, faces]

    backend = "pallas" if (use_pallas if use_pallas is not None
                           else cfg.use_pallas) else "dense"
    out = render_fused(fv, soft_tex, hard_tex, cfg.img_size, backend=backend,
                       surf_tex=surf_tex)

    if not cfg.use_depth:
        out["depth"] = jax.lax.stop_gradient(out["depth"])

    # analytic projected vertices (no y flip: image convention, renderer.py:66)
    imatch_gt = G.project_ndc(verts_cam, pp_crop, foc_crop,
                              flip_y=False)[..., :2]
    imatch_gt = jax.lax.stop_gradient(imatch_gt)
    vert_depth = jax.lax.stop_gradient(verts_cam[..., 2])

    depth_at = grid_sample(out["depth"][..., None], imatch_gt)[..., 0]
    depth_weight = jnp.exp(-5.0 * jax.nn.relu(vert_depth - depth_at))
    depth_weight = jax.lax.stop_gradient(depth_weight)

    return dict(
        mask_render=out["alpha1"], tex_render=out["tex"],
        tex_mask=out["alpha2"], depth_render=out["depth"],
        depth_mask=out["alpha1"], match_gt=out["match"],
        match_mask=out["alpha1"], imatch_gt=imatch_gt,
        depth_weight=depth_weight,
    )


def forward_train(params, batch_stats, dino_params, batch, constants:
                  MeshConstants, rng, cfg: Config, step):
    """One full training forward: returns (total_loss, (aux, new_batch_stats)).

    params = {"net": flax params, "mean_v": (V, 3)}.
    batch: dict with img (B,H,W,3), mask, depth, occ, pp_crop, foc_crop
    (NDC units, trainer.py:98-101).
    """
    w = weights_schedule(step, cfg)
    img = batch["img"]
    mask = batch["mask"]
    b = img.shape[0]

    faces = jnp.asarray(constants.faces)
    mean_v = jnp.broadcast_to(params["mean_v"][None], (b,) + params["mean_v"].shape)
    # sphere prior always trains; an OBJ shape prior trains iff prior_deform
    # (mesh.py:90,116)
    if cfg.shape_prior and not cfg.prior_deform:
        mean_v = jax.lax.stop_gradient(mean_v)

    k_jit, k_sym, k_cyc, k_cycjit = jax.random.split(rng, 4)
    net_in = preprocess(k_jit, img, True)

    net = Networks(cfg)
    (img_feat, mesh_feat, pred_v, rotation, translation, scale), updates = \
        net.apply({"params": params["net"], "batch_stats": batch_stats},
                  net_in, mean_v, batch["pp_crop"], batch["foc_crop"], True,
                  mutable=["batch_stats"])

    meshgrid = corr.make_meshgrid(cfg.corr_h, cfg.corr_w)
    pointcorr, match_map, imatch, _ = corr.dual_softmax_match(
        img_feat, mesh_feat, mask, pred_v, meshgrid,
        cfg.tau_img, cfg.tau_mesh, cfg.corr_h, cfg.corr_w)

    # vertex colors sampled at matched pixels (mesh.py:46-51); with
    # surface_texture the render's texture pass instead uses per-face texel
    # grids sampled at imatch-interpolated points (surface_texture.py:21-55)
    tex = grid_sample(img, imatch)  # (B, N, 3)
    surf = None
    if cfg.surface_texture:
        from selfcorr_tpu.models.surface_texture import surface_texture
        surf = surface_texture(img, imatch, faces, cfg.n_tex_sample)

    r = render_products(pred_v, faces, tex, batch["foc_crop"],
                        batch["pp_crop"], rotation, translation, cfg,
                        surf_tex=surf)

    occ = batch.get("occ") if cfg.use_occ else None
    aux = {}
    zero = jnp.zeros(())
    mask_l = w["mask"] * mask_pyramid_loss(mask, r["mask_render"], occ).mean()
    tex_l = (w["tex"] * texture_loss(img, mask, r["tex_render"],
                                     r["tex_mask"], occ).mean()
             if cfg.tex_wt != 0.0 else zero)
    match_l = (w["match"] * match_loss(match_map, r["match_gt"],
                                       r["match_mask"], mask).mean()
               if cfg.match_wt != 0.0 else zero)
    imatch_l = (w["imatch"] * imatch_loss(imatch, r["imatch_gt"],
                                          r["depth_weight"]).mean()
                if cfg.imatch_wt != 0.0 else zero)

    total = mask_l + tex_l + match_l + imatch_l
    aux.update(mask_loss=mask_l, texture_loss=tex_l, match_loss=match_l,
               imatch_loss=imatch_l)

    if cfg.use_depth:
        if cfg.depth_loss_chamfer:
            from selfcorr_tpu.losses.render_losses import depth_loss_chamfer
            k_dc = jax.random.fold_in(rng, 777)
            depth_l_sub, depth_diff = depth_loss_chamfer(
                k_dc, pred_v, faces, batch["depth"], r["depth_render"],
                r["depth_mask"], mask, batch["pp_crop"], batch["foc_crop"],
                rotation, translation)
        else:
            depth_l_sub, depth_diff = depth_loss(
                batch["depth"], r["depth_render"], r["depth_mask"], mask)
        depth_l = w["depth"] * depth_l_sub.mean()
        total = total + depth_l
        aux["depth_loss"] = depth_l

    # statically-zero weights skip the term's compute entirely (cfg is
    # static under jit) — 0 * term would still trace and execute the whole
    # subgraph; the aux key stays (as 0) so logging/ablation tooling is
    # shape-stable
    if cfg.symmetry_wt != 0.0:
        symm_l = w["symmetry"] * symmetry_loss(
            k_sym, pred_v, faces, jnp.asarray(constants.symm_rots),
            cfg.symmetry_npts)
    else:
        symm_l = zero
    tri_l = w["triangle"] * laplacian_loss(
        pred_v, jnp.asarray(constants.laplacian)) * pred_v.shape[1] / 64.0
    if cfg.flatten_loss:
        tri_l = tri_l + w["triangle"] * flatten_loss(
            pred_v, tuple(jnp.asarray(q) for q in constants.flatten_quads)) \
            * 0.1 * np.sqrt(pred_v.shape[1] / 64.0)
    pull_l = w["pullfar"] * pullfar_loss(translation)
    deform_l = w["deform"] * deform_loss(pred_v, mean_v)
    total = total + symm_l + tri_l + pull_l + deform_l
    aux.update(symmetry_loss=symm_l, triangle_loss=tri_l,
               pullfar_loss=pull_l, deform_loss=deform_l)

    # frozen-DINO cross-frame cycle loss (pretrained_corr.py:107-140).
    # Pairing operates on the GLOBAL batch (videos = B_global / repeat): the
    # 'instance' roll may cross shard boundaries, which XLA lowers to a
    # ppermute over the data axis — semantics equal to the reference's
    # per-GPU roll up to which neighbor instance is paired.
    divide = DIVIDE_FNS[cfg.divide_fn]
    rep = cfg.repeat
    bs = b // rep
    if cfg.cycle_loss_pretrain_wt != 0.0:
        dino = DinoViTS8(flash=flash_attention_available(cfg.dino_flash),
                         attn_bf16=cfg.dino_attn_bf16,
                         pad_once=(cfg.dino_pad_once and
                                   flash_attention_available(cfg.dino_flash)))
        if cfg.dino_bf16:
            dp = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16),
                                        dino_params)
            dino_feat = dino.apply({"params": dp}, img.astype(jnp.bfloat16))
            dino_feat = dino_feat.astype(jnp.float32)
        else:
            dino_feat = dino.apply({"params": dino_params}, img)
        dino_feat = jax.lax.stop_gradient(
            dino_feat.reshape(b, -1, dino_feat.shape[-1]))

        # factored transport: pass the pointcorr FACTORS (img/mesh features)
        # instead of the materialized volume — see dino_cycle_loss docstring
        cyc_pt, _ = corr.dino_cycle_loss(
            divide(dino_feat, bs, rep), divide(mask, bs, rep),
            divide(r["depth_weight"], bs, rep), divide(img_feat, bs, rep),
            divide(mesh_feat, bs, rep), meshgrid, cfg.tau_img, cfg.tau_mesh,
            cfg.corr_h, cfg.corr_w, cfg.pretrain_k)
        cyc_pt = w["cycle_pt"] * cyc_pt
    else:
        cyc_pt = zero

    # rotation-augmentation cycle loss (correspondence.py:76-113). The
    # re-encode uses this step's batch stats without re-updating them (the
    # reference also updates running stats on the rotated batch; running
    # stats only affect eval, so this is inconsequential).
    def encode_fn(x):
        x = preprocess(k_cycjit, x, True)
        (_, f), _ = net.apply(
            {"params": params["net"], "batch_stats": batch_stats},
            x, True, method="encode_img", mutable=["batch_stats"])
        return f

    if cfg.cycle_loss_wt != 0.0:
        cyc, *_ = corr.rotation_cycle_loss(
            k_cyc, img, mask, img_feat, encode_fn, meshgrid, cfg.tau_mesh,
            cfg.corr_h, cfg.corr_w)
        cyc = w["cycle"] * cyc
    else:
        cyc = zero
    total = total + cyc_pt + cyc
    aux.update(cycle_loss_pretrain=cyc_pt, cycle_loss=cyc)

    if cfg.camera_loss:
        rot2 = jax.lax.stop_gradient(rotation).reshape(-1, rep, 3, 3)
        rot2 = jnp.roll(rot2, -1, axis=1).reshape(-1, 3, 3)
        cam_l = w["camera"] * camera_loss(rotation, rot2).mean()
        total = total + cam_l
        aux["cam_loss"] = cam_l

    aux["total_loss"] = total
    return total, (aux, updates["batch_stats"])


def forward_vis(params, batch_stats, dino_params, batch,
                constants: MeshConstants, rng, cfg: Config,
                use_pallas: bool | None = None):
    """Device-side products for the FULL TB image-panel set
    (reference trainer.py:175-198 + model.py:154-307): renders, depth diff,
    mean-mesh depth, rotation-cycle matches and frozen-DINO pair matches.

    batch must hold >= 2 frames of the SAME video (the DINO/cycle panels
    pair frame 0 with frame 1). Host-side drawing lives in utils/vis.py.
    """
    from selfcorr_tpu.losses.render_losses import depth_loss

    img = batch["img"]
    mask = batch["mask"]
    b = img.shape[0]
    faces = jnp.asarray(constants.faces)
    out = forward_test(params, batch_stats, batch, constants, rng, cfg)

    r = render_products(out["pred_v"], faces, out["tex"], batch["foc_crop"],
                        batch["pp_crop"], out["rotation"],
                        out["translation"], cfg, use_pallas=use_pallas)
    vis = dict(out)
    vis.update(r)

    # mean-mesh depth render (renderer.py:60-63 render_mean_mesh: the
    # canonical mean shape under the predicted pose)
    mean_v = jnp.broadcast_to(params["mean_v"][None],
                              (b,) + params["mean_v"].shape)
    rm = render_products(mean_v, faces, jnp.zeros_like(out["tex"]),
                         batch["foc_crop"], batch["pp_crop"],
                         out["rotation"], out["translation"], cfg,
                         use_pallas=use_pallas)
    vis["mean_v_depth"] = rm["depth_render"]
    vis["mean_v_mask"] = rm["depth_mask"]

    if cfg.use_depth:
        _, depth_diff = depth_loss(batch["depth"], r["depth_render"],
                                   r["depth_mask"], mask)
        vis["depth_diff"] = depth_diff

    # rotation-cycle panel (correspondence.py:76-113 products)
    net = Networks(cfg)
    k_cyc, k_jit = jax.random.split(rng)
    net_in = preprocess(rng, img, False)
    _, img_feat = net.apply(
        {"params": params["net"], "batch_stats": batch_stats},
        net_in, False, method="encode_img")

    def encode_fn(x):
        x = preprocess(k_jit, x, False)
        _, f = net.apply(
            {"params": params["net"], "batch_stats": batch_stats},
            x, False, method="encode_img")
        return f

    meshgrid = corr.make_meshgrid(cfg.corr_h, cfg.corr_w)
    _, cycle_match, cycle_gt, cycle_mask = corr.rotation_cycle_loss(
        k_cyc, img, mask, img_feat, encode_fn, meshgrid, cfg.tau_mesh,
        cfg.corr_h, cfg.corr_w)
    vis.update(cycle_match=cycle_match, cycle_match_gt=cycle_gt,
               cycle_mask=cycle_mask)

    # frozen-DINO pair panel: frame 0 (src) vs frame 1 (tgt) of the first
    # video (the reference draws pair 0 of its batch pairing,
    # model.py:267-290)
    dino = DinoViTS8(flash=flash_attention_available(cfg.dino_flash),
                     attn_bf16=cfg.dino_attn_bf16,
                     pad_once=(cfg.dino_pad_once and
                               flash_attention_available(cfg.dino_flash)))
    dino_feat = dino.apply({"params": dino_params}, img[:2])
    dino_feat = dino_feat.reshape(2, -1, dino_feat.shape[-1])
    src_f, tgt_f = dino_feat[0:1], dino_feat[1:2]
    _, dino_vis = corr.dino_cycle_loss_dense(
        (src_f, tgt_f), (mask[0:1], mask[1:2]),
        (r["depth_weight"][0:1], r["depth_weight"][1:2]),
        (out["pointcorr"][0:1], out["pointcorr"][1:2]),
        meshgrid, cfg.tau_img, cfg.tau_mesh, cfg.corr_h, cfg.corr_w,
        min(cfg.pretrain_k, (cfg.corr_h // 2) * (cfg.corr_w // 2)))
    vis.update(pt_pts_src=dino_vis["pts_src"], pt_pts_tgt=dino_vis["pts_tgt"],
               pt_match=dino_vis["match"], pt_mask=dino_vis["mask"])
    return vis


def forward_test(params, batch_stats, batch, constants: MeshConstants,
                 rng, cfg: Config):
    """Eval forward (model.py:61-77 test branch): returns the prediction
    tuple incl. forward-backward match confidence."""
    img = batch["img"]
    b = img.shape[0]
    faces = jnp.asarray(constants.faces)
    mean_v = jnp.broadcast_to(params["mean_v"][None],
                              (b,) + params["mean_v"].shape)
    net_in = preprocess(rng, img, False)
    net = Networks(cfg)
    img_feat, mesh_feat, pred_v, rotation, translation, scale = net.apply(
        {"params": params["net"], "batch_stats": batch_stats},
        net_in, mean_v, batch["pp_crop"], batch["foc_crop"], False)

    meshgrid = corr.make_meshgrid(cfg.corr_h, cfg.corr_w)
    pointcorr, match_map, imatch, match_conf = corr.dual_softmax_match(
        img_feat, mesh_feat, batch["mask"], pred_v, meshgrid,
        cfg.tau_img, cfg.tau_mesh, cfg.corr_h, cfg.corr_w, compute_conf=True)
    tex = grid_sample(img, imatch)
    return dict(pred_v=pred_v, faces=faces, tex=tex, imatch=imatch,
                match=match_map, match_conf=match_conf, rotation=rotation,
                translation=translation, scale=scale, pointcorr=pointcorr)
