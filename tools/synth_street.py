"""Surface-structured synthetic street scene for the convergence bench.

Round-5 replacement for bench.make_scene in the CONVERGENCE protocol
(make_scene stays as the perf-bench distribution): the r4 GT was an
unstructured volumetric noise cloud, so the large kNN-initialized seed
splats had no surface to approximate — their best constant color carried
a large residual everywhere, the photometric loss pushed seed opacities
below the 0.1 cull threshold within ~100 steps, and the store mass-culled
100k -> 7k before densification could act (measured via
tools/diag_densify.py). Real street scenes are SURFACES; a big seed splat
lying on a wall is a good first approximation that survives and then
SPLITS under texture-gradient pressure — the reference's defining
dynamic (sgn_splatfacto.py:550-646 on Waymo corridors, README.md:47-65).

Geometry: ground plane + two segmented walls (with gaps -> visible sky)
+ scattered boxes (parked-car scale). Colors are a deterministic
multi-octave function of position (plus per-surface albedo), so a model
splat at the right place can reproduce them exactly — held-out PSNR is
bounded by model density, not by unlearnable noise. Opacity is high
(surfaces are solid); splat scale tracks the sampling spacing.
"""
from __future__ import annotations

import numpy as np


def corridor_cams(n, w, h, fx, span=10.0, heldout_every=0):
    """n cams along a forward corridor (Waymo-like ego motion): z from 0
    to -span, lateral wiggle, small yaw. heldout_every>0 interleaves
    held-out cams (the reference's eval-interval split quirk,
    sgn_dataparser.py). Returns (train, heldout) camera lists."""
    import jax.numpy as jnp

    from street_gaussians_ns_tpu.core.cameras import Camera

    cams = []
    for i in range(n):
        t = i / max(n - 1, 1)
        dz = -span * t
        dx = 0.8 * np.sin(2.1 * np.pi * t + 0.3)
        yaw = 0.03 * np.sin(3.7 * np.pi * t)
        c, s = np.cos(yaw), np.sin(yaw)
        c2w = jnp.asarray([[c, 0.0, s, dx], [0.0, 1.0, 0.0, 0.0],
                           [-s, 0.0, c, dz]], jnp.float32)
        cams.append(Camera.make(fx, fx, w / 2, h / 2, c2w, w, h))
    if heldout_every <= 0:
        return cams, []
    k = heldout_every
    train = [c for i, c in enumerate(cams) if (i % k) != k // 2]
    held = [c for i, c in enumerate(cams) if (i % k) == k // 2]
    return train, held


def procedural_sky(dirs):
    """Smooth directional sky (horizon gradient + sun blob) for ray dirs
    (..., 3). Pure function of direction => exactly representable by a
    cubemap — the honest analogue of real sky content."""
    import jax.numpy as jnp

    d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    up = jnp.clip(d[..., 1], -1.0, 1.0)
    sun_dir = jnp.asarray([0.35, 0.55, -0.75])
    sun_dir = sun_dir / jnp.linalg.norm(sun_dir)
    sun = jnp.exp(60.0 * (jnp.einsum("...c,c->...", d, sun_dir) - 1.0))
    base = (jnp.asarray([0.45, 0.62, 0.85])
            + up[..., None] * jnp.asarray([-0.15, -0.10, 0.10]))
    return jnp.clip(base + sun[..., None] * jnp.asarray([1.0, 0.9, 0.7]),
                    0.0, 1.0)


def street_protocol(n_gt, n_seed, w, h, fx, views, span, sigma, rcfg_gt,
                    sky="masked", seed=11, rng_seed=42):
    """Build the full convergence protocol over the street scene.

    Returns (batches, train_cams, heldout, (seed_means, seed_colors)):
      * batches[i]: {"image": noisy f32 (H,W,3), "semantic": (H,W,1) int}
        for train view i (per-view gain ~U(1 +- 0.03), sensor noise
        `sigma`, semantic sky mask where GT accumulation < 0.15 — the
        reference's Waymo regime always has segs-derived sky masks
        driving the sky_accumulation loss, sgn_splatfacto.py:1042-1094);
      * heldout: list of (camera, clean target) — views interleaved along
        the same corridor, never trained on;
      * seeds: SfM-like — subsampled GT positions + 10 cm jitter, the
        OBSERVED colors with sensor-ish noise (COLMAP points3D carry
        image RGB).

    All per-view prep runs as ONE jitted program per camera (render +
    sky composite + mask + corruption) — eager per-op sky math over the
    TPU tunnel cost minutes at bench scale.
    """
    import jax
    import jax.numpy as jnp

    from street_gaussians_ns_tpu.core.cameras import pixel_directions
    from street_gaussians_ns_tpu.ops.render import render

    gt_means, gt_scales, gt_quats, gt_opac, gt_rgbs = [
        jnp.asarray(x) for x in make_street_scene(n_gt, seed=seed)]

    def prep(cam, kg, kn):
        out = render(gt_means, gt_scales, gt_quats, gt_opac, gt_rgbs, cam,
                     rcfg_gt)
        rgb = jnp.clip(out.rgb, 0.0, 1.0)
        acc = out.accumulation.reshape(rgb.shape[0], rgb.shape[1])
        sem = None
        if sky == "masked":
            skyimg = procedural_sky(pixel_directions(cam))
            rgb = rgb + (1.0 - acc[..., None]) * skyimg
            sem = (acc < 0.15).astype(jnp.int32)[..., None] * 2
        gain = 1.0 + 0.03 * jax.random.uniform(kg, (), minval=-1.0,
                                               maxval=1.0)
        noisy = jnp.clip(rgb * gain + sigma * jax.random.normal(kn, rgb.shape),
                         0.0, 1.0)
        return noisy, jnp.clip(rgb, 0.0, 1.0), sem

    jprep = jax.jit(prep)

    n_held = max(views // 6, 1)
    n_all = views + n_held
    train_cams, held_cams = corridor_cams(
        n_all, w, h, fx, span=span, heldout_every=max(n_all // n_held, 2))
    if not held_cams:
        held_cams = [train_cams.pop()]
    train_cams = train_cams[:views]

    key = jax.random.PRNGKey(rng_seed)
    batches = []
    for cam in train_cams:
        kg, kn, key = jax.random.split(key, 3)
        noisy, _, sem = jprep(cam, kg, kn)
        b = {"image": noisy}
        if sem is not None:
            b["semantic"] = sem
        batches.append(b)
    heldout = []
    for cam in held_cams:
        kg, kn, key = jax.random.split(key, 3)
        _, clean, _ = jprep(cam, kg, kn)
        heldout.append((cam, clean))
    import jax as _jax
    _jax.block_until_ready(heldout[0][1])

    kj, kc, key = jax.random.split(key, 3)
    idx = jnp.arange(0, n_gt, n_gt // n_seed)[:n_seed]
    seed_means = gt_means[idx] + 0.1 * jax.random.normal(kj, (n_seed, 3))
    seed_colors = np.asarray(jnp.clip(
        gt_rgbs[idx] + 0.05 * jax.random.normal(kc, (n_seed, 3)),
        0.0, 1.0)) * 255.0
    return batches, train_cams, heldout, (np.asarray(seed_means),
                                          seed_colors)


def _texture(p: np.ndarray, rs: np.ndarray) -> np.ndarray:
    """Deterministic multi-octave positional texture in [-0.34, 0.34]."""
    out = np.zeros((p.shape[0], 3), np.float32)
    for freq, amp in ((0.4, 0.12), (1.7, 0.10), (6.0, 0.07), (16.0, 0.05)):
        w = rs.standard_normal((3, 3)).astype(np.float32) * freq
        phase = rs.uniform(0, 2 * np.pi, (3,)).astype(np.float32)
        out += amp * np.sin(p @ w.T + phase)
    return out


def make_street_scene(n: int, seed: int = 11,
                      z_range=(-75.0, 5.0), ground_y=-1.8):
    """Returns (means, scales, quats, opac, rgbs) as float32 numpy arrays.

    means: (n,3); scales: (n,3) positive (world units, NOT log);
    quats: (n,4) wxyz normalized; opac: (n,) in (0,1); rgbs: (n,3) in [0,1].
    """
    rs = np.random.RandomState(seed)
    z0, z1 = z_range
    length = z1 - z0

    surfaces = []  # (area, sampler(m) -> (pts, albedo))

    ground_hw = 12.0
    ground_area = 2 * ground_hw * length

    def sample_ground(m):
        x = rs.uniform(-ground_hw, ground_hw, m)
        z = rs.uniform(z0, z1, m)
        y = np.full(m, ground_y)
        alb = np.tile(np.asarray([[0.42, 0.40, 0.38]], np.float32), (m, 1))
        # lane-marking stripes: brighter band near x=+-1.8
        stripe = (np.abs(np.abs(x) - 1.8) < 0.12).astype(np.float32)
        alb = alb + stripe[:, None] * np.asarray([0.35, 0.35, 0.30])
        return np.stack([x, y, z], -1).astype(np.float32), alb

    surfaces.append((ground_area, sample_ground))

    # Segmented walls with gaps (gaps -> sky visible at the sides).
    wall_h = 6.0
    seg_len = 10.0
    nseg = int(length / seg_len)
    wall_segs = []
    for side in (-9.0, 9.0):
        for k in range(nseg):
            if rs.uniform() < 0.25:
                continue  # gap
            h = wall_h * rs.uniform(0.6, 1.2)
            alb = rs.uniform(0.25, 0.75, 3).astype(np.float32)
            wall_segs.append((side, z0 + k * seg_len, h, alb))
    wall_area = sum(seg_len * h for _, _, h, _ in wall_segs)

    def sample_walls(m):
        areas = np.asarray([seg_len * h for _, _, h, _ in wall_segs])
        pick = rs.choice(len(wall_segs), m, p=areas / areas.sum())
        side = np.asarray([wall_segs[i][0] for i in pick], np.float32)
        zlo = np.asarray([wall_segs[i][1] for i in pick], np.float32)
        hh = np.asarray([wall_segs[i][2] for i in pick], np.float32)
        alb = np.stack([wall_segs[i][3] for i in pick])
        x = side + rs.uniform(-0.05, 0.05, m)
        z = zlo + rs.uniform(0, seg_len, m)
        y = ground_y + rs.uniform(0, 1, m) * hh
        return np.stack([x, y, z], -1).astype(np.float32), alb

    surfaces.append((wall_area, sample_walls))

    # Boxes (parked-car scale) on the ground, clear of the camera path.
    boxes = []
    for _ in range(24):
        cx = rs.choice([-1.0, 1.0]) * rs.uniform(2.5, 7.0)
        cz = rs.uniform(z0 + 2.0, z1 - 8.0)
        w, h, d = (2.0 * rs.uniform(0.7, 1.3), 1.5 * rs.uniform(0.7, 1.3),
                   4.5 * rs.uniform(0.7, 1.3))
        alb = rs.uniform(0.15, 0.85, 3).astype(np.float32)
        boxes.append((cx, cz, w, h, d, alb))
    box_area_one = lambda w, h, d: 2 * (w * h + d * h) + w * d  # noqa: E731
    box_area = sum(box_area_one(w, h, d) for _, _, w, h, d, _ in boxes)

    def sample_boxes(m):
        areas = np.asarray([box_area_one(w, h, d)
                            for _, _, w, h, d, _ in boxes])
        pick = rs.choice(len(boxes), m, p=areas / areas.sum())
        bp = np.asarray([[cx, cz, w, h, d] for cx, cz, w, h, d, _ in boxes],
                        np.float32)[pick]
        alb = np.stack([boxes[i][5] for i in pick])
        cx, cz, w, h, d = bp.T
        # faces: -x, +x, -z, +z, +y — per-point area-weighted choice.
        fa = np.stack([d * h, d * h, w * h, w * h, w * d], -1)
        cum = np.cumsum(fa, -1)
        r = rs.uniform(size=m).astype(np.float32) * cum[:, -1]
        f = (r[:, None] >= cum).sum(-1)
        u = rs.uniform(-0.5, 0.5, m).astype(np.float32)
        v = rs.uniform(-0.5, 0.5, m).astype(np.float32)
        sx = np.where(f < 2, cx + np.where(f == 0, -1, 1) * w / 2, cx + u * w)
        sy = np.where(f == 4, ground_y + h, ground_y + (v + 0.5) * h)
        sz = np.where(f < 2, cz + u * d,
                      np.where(f < 4, cz + np.where(f == 2, -1, 1) * d / 2,
                               cz + v * d))
        return np.stack([sx, sy, sz], -1).astype(np.float32), alb

    surfaces.append((box_area, sample_boxes))

    total_area = sum(a for a, _ in surfaces)
    counts = [int(n * a / total_area) for a, _ in surfaces]
    counts[0] += n - sum(counts)

    pts_l, alb_l = [], []
    for (area, fn), m in zip(surfaces, counts):
        p, a = fn(m)
        pts_l.append(p)
        alb_l.append(a)
    means = np.concatenate(pts_l)
    albedo = np.concatenate(alb_l)

    rgbs = np.clip(albedo + _texture(means, np.random.RandomState(seed + 1)),
                   0.0, 1.0).astype(np.float32)

    # Scale ~ sampling spacing (sqrt of area per point), isotropic.
    spacing = np.sqrt(total_area / n)
    scales = (spacing * rs.uniform(0.5, 0.9, (n, 1)).astype(np.float32)
              * np.ones((1, 3), np.float32))
    # Shoemake random quats.
    u1, u2, u3 = rs.uniform(size=(3, n)).astype(np.float32)
    quats = np.stack([
        np.sqrt(u1) * np.cos(2 * np.pi * u3),
        np.sqrt(1 - u1) * np.sin(2 * np.pi * u2),
        np.sqrt(1 - u1) * np.cos(2 * np.pi * u2),
        np.sqrt(u1) * np.sin(2 * np.pi * u3)], -1)
    opac = rs.uniform(0.7, 0.98, n).astype(np.float32)
    perm = rs.permutation(n)
    return (means[perm], scales[perm].astype(np.float32),
            quats[perm].astype(np.float32), opac[perm], rgbs[perm])
