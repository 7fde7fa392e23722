"""On-device synthetic batch generation (TPU-resident data path).

Renders the SyntheticVideos ellipsoid/duo scenes DIRECTLY on the
accelerator inside one jitted function, replacing the host loader +
host->device upload for `dataset_name="synthetic"` runs. Motivation
(PERF.md round 4): the tunneled IFRT-proxy transport retains a copy of
every host->device transfer (~15 MB/step at flagship shapes -> a 20k-iter
run OOM'd the host), and the single-core host makes the loader the
noisiest part of the measured loop (printed intervals swing 55-140 imgs/s
with host activity). Generating on device removes BOTH: zero per-step
H2D traffic, zero host work.

Two deliberate deviations from the host path (data/synthetic.py +
data/crops.py), both distribution-level only and pinned by
tests/test_synth_device.py:

* the crop box comes from the ANALYTIC silhouette bbox (the ray-hit
  region `disc > 0` of an ellipsoid is an ellipse in ray-direction space;
  its extent has the closed form  e_c +- sqrt(diag(P^-1) * (w^T P^-1 w -
  c0))  for the conic e^T P e + 2 w^T e + c0 <= 0) instead of scanning a
  raw-resolution rendered mask — agrees with the host `mask_bbox` to ~1 px
  (pixel-center quantization);
* the crop is rendered DIRECTLY at img_size through the crop-adjusted
  camera (a crop is just an intrinsics change), i.e. the scene is
  evaluated exactly at the positions cv2.resize would sample — no raw
  render, no resample pass. Pixel values match the host pipeline up to
  bilinear-filter footprint (host: 4-tap average of raw texels; here:
  exact evaluation at the sample point).

RNG uses jax.random (vids uniform, gap-stratified fids, U(1.2,1.5) crop
scales) — the same sampling LAW as SyntheticTrain.sample_plan/load_item,
not the same numpy stream. The video-major, frame-minor batch layout the
pairing losses rely on is preserved.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from selfcorr_tpu.configs import Config
from selfcorr_tpu.data.synthetic import SyntheticVideos


def _video_tables(videos: SyntheticVideos):
    """Per-video scene constants as stacked arrays (host, once)."""
    v = videos.n_videos
    parts = []
    for vid in range(v):
        parts.append(videos.parts(vid))
    n_parts = len(parts[0])
    radii = np.stack([[p[i][0] for p in parts] for i in range(n_parts)], 0)
    cents = np.stack([[p[i][1] for p in parts] for i in range(n_parts)], 0)
    cb0 = np.stack([videos.canonical_box(vid)[0] for vid in range(v)])
    size = np.stack([videos.canonical_box(vid)[1] for vid in range(v)])
    return dict(
        radii=jnp.asarray(radii, jnp.float32),      # (P, V, 3)
        cents=jnp.asarray(cents, jnp.float32),      # (P, V, 3)
        phase=jnp.asarray(videos.phase, jnp.float32),
        tilt=jnp.asarray(videos.tilt, jnp.float32),
        z0=jnp.asarray(videos.z0, jnp.float32),
        cb0=jnp.asarray(cb0, jnp.float32),          # (V, 3)
        size=jnp.asarray(size, jnp.float32),        # (V, 3)
    )


def _rot_mats(tilt, theta):
    """Batched R = rot_x(tilt) @ rot_y(theta), rows act as in synthetic.py."""
    ct, st = jnp.cos(tilt), jnp.sin(tilt)
    cy, sy = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(ct)
    o = jnp.ones_like(ct)
    rx = jnp.stack([o, z, z, z, ct, -st, z, st, ct], -1).reshape(-1, 3, 3)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(-1, 3, 3)
    return rx @ ry


def _part_geometry(radii, cent, R, z0):
    """Per-(item, part) ray-trace constants. radii/cent (B,3), R (B,3,3).

    M = diag(1/r) @ R^T (rows R[:, i] / r_i); cw = cent @ R^T + (0,0,z0);
    om = -cw @ M^T. Returns (M (B,3,3), om (B,3), cw (B,3))."""
    m = jnp.swapaxes(R, 1, 2) / radii[:, :, None]
    c = jnp.concatenate([jnp.zeros_like(z0[:, None]),
                         jnp.zeros_like(z0[:, None]), z0[:, None]], -1)
    cw = jnp.einsum("bij,bj->bi", R, cent) + c   # cb @ R^T == R cb
    om = jnp.einsum("bi,bji->bj", -cw, m)
    return m, om, cw


def _part_bbox_dxdy(m, om):
    """Analytic silhouette extent of one ellipsoid part in ray-direction
    (dx, dy) space. The hit region {disc > 0} is
      (om . dm)^2 >= k |dm|^2,  dm = A e + m3,  k = |om|^2 - 1,
    an ellipse {e^T P e + 2 w^T e + c0 <= 0} with Q = k I - om om^T,
    P = A^T Q A, w = A^T Q m3, c0 = m3^T Q m3. Extents per axis:
      e_c = -P^-1 w,  half = sqrt(diag(P^-1) * (w^T P^-1 w - c0)).
    Returns (lo (B,2), hi (B,2)) in (dx, dy)."""
    a2 = m[:, :, :2]                                     # A: (B, 3, 2)
    m3 = m[:, :, 2]                                      # (B, 3)
    k = jnp.sum(om * om, -1) - 1.0                       # (B,)
    eye = jnp.eye(3, dtype=m.dtype)
    q = k[:, None, None] * eye - om[:, :, None] * om[:, None, :]
    p = jnp.einsum("bij,bik,bkl->bjl", a2, q, a2)        # (B, 2, 2)
    w = jnp.einsum("bij,bik,bk->bj", a2, q, m3)          # (B, 2)
    c0 = jnp.einsum("bi,bij,bj->b", m3, q, m3)           # (B,)
    det = p[:, 0, 0] * p[:, 1, 1] - p[:, 0, 1] * p[:, 1, 0]
    pinv = jnp.stack([
        jnp.stack([p[:, 1, 1], -p[:, 0, 1]], -1),
        jnp.stack([-p[:, 1, 0], p[:, 0, 0]], -1)], 1) / det[:, None, None]
    ec = -jnp.einsum("bij,bj->bi", pinv, w)              # (B, 2)
    s = jnp.einsum("bi,bij,bj->b", w, pinv, w) - c0      # (B,)
    half = jnp.sqrt(jnp.maximum(
        jnp.stack([pinv[:, 0, 0], pinv[:, 1, 1]], -1) * s[:, None], 0.0))
    return ec - half, ec + half


def _trace_parts(d, tables, vids, R, z0, n_parts):
    """Ray-trace the <=2-part union. d (B,S,S,3) unit-z rays. Returns
    (hit bool, t f32, obj (B,S,S,3) object-frame surface points)."""
    t_best = jnp.full(d.shape[:-1], jnp.inf, jnp.float32)
    hit = jnp.zeros(d.shape[:-1], bool)
    for i in range(n_parts):
        radii = tables["radii"][i][vids]
        cent = tables["cents"][i][vids]
        m, om, _ = _part_geometry(radii, cent, R, z0)
        dm = jnp.einsum("bhwi,bji->bhwj", d, m)
        a = jnp.sum(dm * dm, -1)
        b = 2.0 * jnp.einsum("bhwi,bi->bhw", dm, om)
        cc = (jnp.sum(om * om, -1) - 1.0)[:, None, None]
        disc = b * b - 4.0 * a * cc
        h = disc > 0
        t = jnp.where(h, (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
                      / (2.0 * a), jnp.inf)
        t_best = jnp.minimum(t_best, t)
        hit = hit | h
    t = jnp.where(hit, t_best, 0.0)
    c = jnp.stack([jnp.zeros_like(z0), jnp.zeros_like(z0), z0], -1)
    p = d * t[..., None] - c[:, None, None, :]
    obj = jnp.einsum("bhwi,bij->bhwj", p, R)             # p @ R per item
    return hit, t, obj


def crop_bbox_analytic(tables, vids, R, z0, raw: int, n_parts: int):
    """Union silhouette bbox in raw-pixel index space, matching the host
    mask_bbox convention (covered pixel CENTERS, integer // arithmetic).
    Returns (center (B,2) int32, length (B,2) int32) in (x, y) order."""
    foc = raw * 1.2
    pp = raw / 2.0
    lo = None
    hi = None
    for i in range(n_parts):
        radii = tables["radii"][i][vids]
        cent = tables["cents"][i][vids]
        m, om, _ = _part_geometry(radii, cent, R, z0)
        plo, phi = _part_bbox_dxdy(m, om)
        lo = plo if lo is None else jnp.minimum(lo, plo)
        hi = phi if hi is None else jnp.maximum(hi, phi)
    # pixel centers at index + 0.5: dx_i = (i + 0.5 - pp) / foc inside
    # [lo, hi]  =>  i in [lo*foc + pp - 0.5, hi*foc + pp - 0.5]
    imin = jnp.ceil(lo * foc + pp - 0.5)
    imax = jnp.floor(hi * foc + pp - 0.5)
    imin = jnp.clip(imin, 0, raw - 1).astype(jnp.int32)
    imax = jnp.clip(imax, 0, raw - 1).astype(jnp.int32)
    center = (imax + imin) // 2
    length = (imax - imin) // 2
    return center, length


def render_crop(tables, vids, fids, center, length, out_size: int, raw: int,
                n_frames: int, n_parts: int):
    """Render the scene directly through the crop camera at out_size.

    center/length: crop box (x, y) in raw-pixel units (already scaled).
    Returns the train batch fields (img, mask, depth, foc_crop, pp_crop) —
    foc_crop/pp_crop in NDC units like crops.to_ndc_intrinsics."""
    theta = (tables["phase"][vids]
             + 2.0 * jnp.pi * fids.astype(jnp.float32) / n_frames)
    R = _rot_mats(tables["tilt"][vids], theta)
    z0 = tables["z0"][vids]
    foc = raw * 1.2
    pp = raw / 2.0
    s = out_size

    cf = jnp.float32(s / 2.0) / length.astype(jnp.float32)      # (B, 2)
    foc_ndc = foc * cf / (s / 2.0)
    pp_ndc = ((pp - (center - length).astype(jnp.float32)) * cf
              / (s / 2.0) - 1.0)

    # cv2.resize sample positions: output pixel i reads raw coordinate
    # x0 + (i + 0.5) * (2 * lx / S)  (crops.crop_resize); rays follow.
    idx = (jnp.arange(s, dtype=jnp.float32) + 0.5) * 2.0 / s     # (S,)
    x0 = (center - length).astype(jnp.float32)                   # (B, 2)
    xs = x0[:, 0:1] + idx[None, :] * length[:, 0:1]              # (B, S)
    ys = x0[:, 1:2] + idx[None, :] * length[:, 1:2]
    dx = (xs - pp) / foc
    dy = (ys - pp) / foc
    d = jnp.stack([jnp.broadcast_to(dx[:, None, :], (dx.shape[0], s, s)),
                   jnp.broadcast_to(dy[:, :, None], (dy.shape[0], s, s)),
                   jnp.ones((dx.shape[0], s, s), jnp.float32)], -1)

    hit, t, obj = _trace_parts(d, tables, vids, R, z0, n_parts)
    depth = jnp.where(hit, t * 1000.0, 0.0)

    u = (obj - tables["cb0"][vids][:, None, None, :]) \
        / (tables["size"][vids][:, None, None, :] / 2.0)
    tex_r = 0.5 + 0.5 * jnp.sin(6 * u[..., 0] + 2 * u[..., 2])
    tex_g = 0.5 + 0.5 * jnp.sin(5 * u[..., 1] - 3 * u[..., 0])
    tex_b = 0.5 + 0.5 * jnp.cos(4 * u[..., 2] + u[..., 1])
    shade = 0.4 + 0.6 * jnp.clip(-u[..., 2], 0.0, 1.0)
    img = jnp.stack([tex_r, tex_g, tex_b], -1) * shade[..., None]
    img = jnp.where(hit[..., None], img, 0.05).astype(jnp.float32)
    return dict(img=img, mask=hit.astype(jnp.float32), depth=depth,
                foc_crop=foc_ndc.astype(jnp.float32),
                pp_crop=pp_ndc.astype(jnp.float32))


def make_device_synth(cfg: Config, videos: SyntheticVideos | None = None):
    """Jitted key -> train-batch generator (single process/device path)."""
    videos = videos or SyntheticVideos(
        seed=cfg.seed, shape=getattr(cfg, "synthetic_shape", "ellipsoid"))
    tables = _video_tables(videos)
    n_parts = 1 if videos.shape == "ellipsoid" else 2
    bs, rp = cfg.batch_size, cfg.repeat
    nf, nv, raw, s = videos.n_frames, videos.n_videos, videos.raw, cfg.img_size

    @jax.jit
    def gen(key):
        k1, k2, k3 = jax.random.split(key, 3)
        vids = jax.random.randint(k1, (bs,), 0, nv)
        gap = max(nf // rp, 1)
        offs = jax.random.randint(k2, (bs, rp), 0, gap)
        fids = jnp.minimum(jnp.arange(rp)[None, :] * gap + offs, nf - 1)
        vids = jnp.repeat(vids, rp)                  # video-major layout
        fids = fids.reshape(-1)                      # frame-minor
        scale = jax.random.uniform(k3, (bs * rp, 2), minval=1.2, maxval=1.5)

        theta = (tables["phase"][vids]
                 + 2.0 * jnp.pi * fids.astype(jnp.float32) / nf)
        rmats = _rot_mats(tables["tilt"][vids], theta)
        center, length0 = crop_bbox_analytic(tables, vids, rmats,
                                             tables["z0"][vids], raw, n_parts)
        length = jnp.maximum(
            (scale * length0.astype(jnp.float32)).astype(jnp.int32), 1)

        out = render_crop(tables, vids, fids, center, length, s, raw,
                          nf, n_parts)
        b = bs * rp
        out["occ"] = jnp.zeros((b, s, s), jnp.float32)
        return out

    return gen
