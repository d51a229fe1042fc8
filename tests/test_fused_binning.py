"""Fused bin+pack+composite path (ops.tiles.bin_and_pack +
composite_pallas.rasterize_tiles_pallas_fused) vs the separate
bin_gaussians + rasterize_tiles_pallas path: identical pair enumeration,
identical images, identical gradients. Interpret mode so both Pallas
paths run on CPU exactly as compiled on TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.core.cameras import viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.composite_pallas import (
    rasterize_tiles_pallas, rasterize_tiles_pallas_fused)
from street_gaussians_ns_tpu.ops.tiles import bin_and_pack, bin_gaussians

from test_pallas_composite import MAX_PAIRS, make_scene


def _project(means, scales, quats, cam):
    vm = viewmat_from_c2w(cam.c2w)
    return project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx,
                   cam.cy, cam.width, cam.height, tile_size=16)


@pytest.mark.parametrize("interpret", [False, True])
@pytest.mark.parametrize("seed,n", [
    (0, 120),
    pytest.param(3, 250, marks=pytest.mark.slow)])
def test_bins_match_reference_binning(seed, n, interpret):
    means, scales, quats, colors, opac, cam = make_scene(n, seed)
    p = _project(means, scales, quats, cam)
    # Both paths opacity-aware (coverage_q) so pair sets stay identical.
    ref = bin_gaussians(p, cam.width, cam.height, 16, MAX_PAIRS,
                        opacities=opac)
    depth_key = jnp.where(p.num_tiles_hit > 0, p.depths, jnp.inf)
    bins, feats = bin_and_pack(
        p.xys, p.conics, p.tile_box, depth_key, colors, opac,
        cam.width, cam.height, 16, MAX_PAIRS, interpret=interpret)

    np.testing.assert_array_equal(bins.tile_start, ref.tile_start)
    np.testing.assert_array_equal(bins.tile_count, ref.tile_count)
    np.testing.assert_array_equal(bins.pair_valid, ref.pair_valid)
    np.testing.assert_array_equal(bins.exp_slot, ref.exp_slot)
    np.testing.assert_array_equal(bins.depth_order, ref.depth_order)
    np.testing.assert_array_equal(bins.exp_starts, ref.exp_starts)
    np.testing.assert_array_equal(bins.exp_counts, ref.exp_counts)
    valid = np.asarray(ref.pair_valid)
    np.testing.assert_array_equal(np.asarray(bins.gauss_idx)[valid],
                                  np.asarray(ref.gauss_idx)[valid])

    # Feature columns = the gathered per-gaussian attributes, in sorted
    # pair order; invalid slots are zero.
    gi = np.asarray(ref.gauss_idx)
    table = np.concatenate([
        np.asarray(p.xys), np.asarray(p.conics),
        np.asarray(opac)[:, None], np.asarray(colors)], axis=-1)
    for c in range(10):
        col = np.asarray(feats[c])
        np.testing.assert_allclose(col[valid], table[gi[valid], c],
                                   atol=0, rtol=0)
        np.testing.assert_array_equal(col[~valid], 0.0)


@pytest.mark.parametrize("seed,n,opaque", [
    pytest.param(0, 60, False, marks=pytest.mark.slow),
    pytest.param(2, 200, True, marks=pytest.mark.slow)])
def test_fused_image_and_grads_match_unfused(seed, n, opaque):
    means, scales, quats, colors, opac, cam = make_scene(
        n, seed, w=48, h=32, opaque=opaque)
    p = _project(means, scales, quats, cam)
    bins = bin_gaussians(p, 48, 32, 16, MAX_PAIRS)
    bg = jnp.array([0.2, 0.1, 0.0, 0.0])
    target = jax.random.uniform(jax.random.PRNGKey(7), (32, 48, 4))

    def loss_old(args):
        xys, conics, cols, op = args
        img, alpha = rasterize_tiles_pallas(
            xys, conics, cols, op, bins, 48, 32, 16, bg, interpret=True)
        return jnp.mean(jnp.abs(img - target)) + 0.3 * jnp.mean(alpha ** 2)

    def loss_fused(args):
        xys, conics, cols, op = args
        pr = p
        object.__setattr__  # keep proj immutable; rebuild lightweight
        import dataclasses
        pr = dataclasses.replace(p, xys=xys, conics=conics)
        img, alpha, _ = rasterize_tiles_pallas_fused(
            pr, cols, op, 48, 32, 16, bg, MAX_PAIRS, interpret=True)
        return jnp.mean(jnp.abs(img - target)) + 0.3 * jnp.mean(alpha ** 2)

    args = (p.xys, p.conics, colors, opac)
    l_old, g_old = jax.value_and_grad(loss_old)(args)
    l_new, g_new = jax.value_and_grad(loss_fused)(args)
    np.testing.assert_allclose(l_new, l_old, atol=1e-6)
    for nm, a, b in zip(["xys", "conics", "colors", "opac"], g_new, g_old):
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=nm)


@pytest.mark.slow
def test_bf16_precision_mode_close_to_f32():
    """precision="bf16" rides conics/opacity/colors through the binning
    sorts as bf16 pairs: images and gradients must track the f32 path
    within the documented ~2^-8 quantization; xy geometry and pair
    ORDERING must be exactly preserved."""
    means, scales, quats, colors, opac, cam = make_scene(2, 200, w=48,
                                                         h=32)
    p = _project(means, scales, quats, cam)
    bg = jnp.array([0.2, 0.1, 0.0, 0.0])
    target = jax.random.uniform(jax.random.PRNGKey(7), (32, 48, 4))

    def loss(args, precision):
        xys, conics, cols, op = args
        import dataclasses
        pr = dataclasses.replace(p, xys=xys, conics=conics)
        img, alpha, bins = rasterize_tiles_pallas_fused(
            pr, cols, op, 48, 32, 16, bg, MAX_PAIRS, interpret=True,
            precision=precision)
        return (jnp.mean(jnp.abs(img - target))
                + 0.3 * jnp.mean(alpha ** 2)), (img, bins)

    args = (p.xys, p.conics, colors, opac)
    (l32, (img32, b32)), g32 = jax.value_and_grad(
        lambda a: loss(a, "f32"), has_aux=True)(args)
    (l16, (img16, b16)), g16 = jax.value_and_grad(
        lambda a: loss(a, "bf16"), has_aux=True)(args)

    # Enumeration identical (rounding cannot reorder: depth key and tile
    # boxes are untouched; coverage uses the rounded opacity on both
    # sides of the same sort).
    np.testing.assert_array_equal(np.asarray(b16.tile_count),
                                  np.asarray(b32.tile_count))
    np.testing.assert_allclose(np.asarray(img16), np.asarray(img32),
                               atol=2e-2)
    np.testing.assert_allclose(float(l16), float(l32), rtol=5e-3,
                               atol=1e-3)
    for nm, a, b in zip(["xys", "conics", "colors", "opac"], g16, g32):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                   err_msg=nm)


@pytest.mark.slow   # ~25 s interpret-mode; NaN-regression guard
def test_fused_depth_column_with_invisible_gaussians_is_finite():
    """Invisible gaussians carry +inf in the depth sort key; the fused
    path must sanitize the ridden depth COLUMN before the expansion
    one-hot matmuls (inf * 0 = NaN would poison whole output blocks —
    regression test for the train-scale NaN this caused)."""
    import dataclasses
    means, scales, quats, colors, opac, cam = make_scene(2, 200, w=48,
                                                         h=32)
    p = _project(means, scales, quats, cam)
    assert int((p.num_tiles_hit == 0).sum()) > 0, "need invisible splats"
    bg = jnp.zeros((4,))
    c4 = jnp.concatenate([colors[:, :3], p.depths[:, None]], -1)

    def loss(args):
        xys, conics, cols, op = args
        pr = dataclasses.replace(p, xys=xys, conics=conics)
        img, alpha, _ = rasterize_tiles_pallas_fused(
            pr, cols, op, 48, 32, 16, bg, MAX_PAIRS, interpret=True,
            last_color_is_depth=True)
        return jnp.mean(jnp.abs(img - 0.5)) + 0.3 * jnp.mean(alpha ** 2)

    args = (p.xys, p.conics, c4, opac)
    l, g = jax.value_and_grad(loss)(args)
    assert np.isfinite(float(l))
    for nm, x in zip(["xys", "conics", "colors", "opac"], g):
        assert bool(jnp.isfinite(x).all()), nm


# Both precisions slow: ~37 s each in interpret mode; the sliced-path
# equivalence (test_sharded) covers the strip contract in the default run.
@pytest.mark.parametrize("precision", [
    pytest.param("f32", marks=pytest.mark.slow),
    pytest.param("bf16", marks=pytest.mark.slow)])
def test_strip_fused_tiles_match_full_image(precision):
    """composite_tiles_pallas_fused over every strip must reproduce the
    full-image fused render tile-for-tile, and the per-gaussian grads
    summed over strips must equal the full-image grads (the sharded
    path's collective transpose does exactly that sum)."""
    import dataclasses
    from street_gaussians_ns_tpu.ops.composite_pallas import (
        TILE, PIX, composite_tiles_pallas_fused)

    means, scales, quats, colors, opac, cam = make_scene(1, 150, w=80,
                                                         h=32)
    W2, H2 = 80, 32              # ntx=5, nty=2 -> 10 tiles
    p = _project(means, scales, quats, cam)
    bg = jnp.zeros((4,), jnp.float32)

    def full(args):
        xys, conics, cols, op = args
        pr = dataclasses.replace(p, xys=xys, conics=conics)
        img, alpha, _ = rasterize_tiles_pallas_fused(
            pr, cols, op, W2, H2, 16, bg, MAX_PAIRS, interpret=True,
            precision=precision)
        return jnp.sum(img ** 2) + jnp.sum(alpha), (img, alpha)

    # 4 strips of 3 tiles: the last strip is real tile 9 + 2 pads.
    def strips(args):
        xys, conics, cols, op = args
        pr = dataclasses.replace(p, xys=xys, conics=conics)
        total, accs, alphas = 0.0, [], []
        for s in range(4):
            accum, alpha, _ = composite_tiles_pallas_fused(
                pr, cols, op, s * 3, 3, W2, H2, MAX_PAIRS,
                interpret=True, precision=precision)
            accs.append(accum)
            alphas.append(alpha)
        accum = jnp.concatenate(accs)[:10]          # drop pad tiles
        alpha = jnp.concatenate(alphas)[:10]
        img = accum.reshape(2, 5, TILE, TILE, 4).transpose(
            0, 2, 1, 3, 4).reshape(H2, W2, 4)
        alpha_img = alpha.reshape(2, 5, TILE, TILE).transpose(
            0, 2, 1, 3).reshape(H2, W2)
        return (jnp.sum(img ** 2) + jnp.sum(alpha_img),
                (img, alpha_img))

    args = (p.xys, p.conics, colors, opac)
    (l_f, (img_f, a_f)), g_f = jax.value_and_grad(full, has_aux=True)(args)
    (l_s, (img_s, a_s)), g_s = jax.value_and_grad(strips,
                                                  has_aux=True)(args)
    np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_f),
                               atol=1e-5)
    for nm, a, b in zip(["xys", "conics", "colors", "opac"], g_s, g_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, err_msg=nm)
