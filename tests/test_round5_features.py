"""Round-5 feature tests: the capacity-free pair-count probe, the
refinement parent-budget knob, and the bf16 layer merge."""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_pallas_composite import make_scene

from street_gaussians_ns_tpu.core.cameras import Camera, viewmat_from_c2w
from street_gaussians_ns_tpu.core.projection import project
from street_gaussians_ns_tpu.ops.tiles import bin_gaussians, count_pairs


def _proj(n=300, seed=2, w=96, h=80):
    means, scales, quats, colors, opac, cam = make_scene(n, seed, w=w, h=h)
    vm = viewmat_from_c2w(cam.c2w)
    p = project(means, scales, quats, vm, cam.fx, cam.fy, cam.cx, cam.cy,
                cam.width, cam.height, tile_size=16, opacities=opac)
    return p, opac, cam


class TestCountPairs:
    def test_matches_binning(self):
        """The probe's capacity-free counts must equal the real binning's
        capacity-independent num_pairs/num_rowruns (the pre-sizing
        contract: a probe that under-counts would size capacities the
        step then overflows)."""
        p, opac, cam = _proj()
        bins = bin_gaussians(p, cam.width, cam.height, 16, 1 << 15,
                             opacities=opac)
        np_probe, nr_probe = count_pairs(p, cam.width, cam.height, 16,
                                         opacities=opac)
        assert int(np_probe) == int(bins.num_pairs)
        assert int(nr_probe) == int(bins.num_rowruns)

    def test_inactive_rows_counted_zero(self):
        p, opac, cam = _proj()
        p0 = dataclasses.replace(
            p, radii=jnp.zeros_like(p.radii),
            num_tiles_hit=jnp.zeros_like(p.num_tiles_hit))
        np_probe, nr_probe = count_pairs(p0, cam.width, cam.height, 16,
                                         opacities=opac)
        assert int(np_probe) == 0 and int(nr_probe) == 0


class TestParentBudgetKnob:
    def test_div_changes_budget_not_semantics(self):
        """With few split parents, refine results are identical across
        parent-budget divisors (the budget only binds when the parent
        count exceeds capacity // div)."""
        from street_gaussians_ns_tpu.models import refinement
        from street_gaussians_ns_tpu.models.gaussians import (
            GaussianParams, GaussianStore)
        from street_gaussians_ns_tpu.models.splatfacto import (
            SplatfactoConfig)

        cap = 1024
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 6)
        params = GaussianParams(
            means=jax.random.normal(ks[0], (cap, 3)),
            scales=jax.random.normal(ks[1], (cap, 3)) * 0.3 - 3.0,
            quats=jax.random.normal(ks[2], (cap, 4)),
            features_dc=jax.random.normal(ks[3], (cap, 1, 3)),
            features_rest=jnp.zeros((cap, 0, 3)),
            opacities=jax.random.normal(ks[4], (cap, 1)),
        )
        # Only the first 100 rows carry densify pressure, so the parent
        # count stays under every budget level tested.
        grads = jnp.where(jnp.arange(cap) < 100, 0.1, 0.0)
        store = GaussianStore(
            params=params, active=jnp.arange(cap) < 400,
            xys_grad_norm=grads,
            vis_counts=jnp.full((cap,), 10.0),
            max_2dsize=jnp.zeros((cap,)))
        outs = []
        for div in (2, 16):
            cfg = SplatfactoConfig(capacity=cap, refine_parent_cap_div=div,
                                   warmup_length=100)
            s2, surgery, info = refinement.refine(
                store, jnp.int32(700), cfg, num_train_data=5,
                max_hw=jnp.float32(128.0), rng=jax.random.PRNGKey(3))
            outs.append((np.asarray(s2.active),
                         int(info["gaussian_count"]),
                         int(info["children_dropped"])))
        assert outs[0][2] == 0 and outs[1][2] == 0, outs
        assert outs[0][1] == outs[1][1]
        np.testing.assert_array_equal(outs[0][0], outs[1][0])


class TestBf16LayerMerge:
    def test_close_to_f32(self):
        from street_gaussians_ns_tpu.parallel.sharded import _combine_layers

        mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("model",))
        k = jax.random.PRNGKey(1)
        accum = jax.random.uniform(k, (4, 8, 256, 4)) * 0.5
        alpha = jax.random.uniform(jax.random.PRNGKey(2), (4, 8, 256)) * 0.9

        # shard_map over leading axis: each device holds one (1, 8, ...)
        # slab; _combine_layers all_gathers and merges.
        def run2(bf16):
            f = jax.jit(jax.shard_map(
                lambda a, t: _combine_layers(a[0], t[0], bf16=bf16),
                mesh=mesh,
                in_specs=(jax.sharding.PartitionSpec("model"),) * 2,
                out_specs=jax.sharding.PartitionSpec(),
                check_vma=False))
            return f(accum, alpha)

        c32, a32 = run2(False)
        c16, a16 = run2(True)
        np.testing.assert_allclose(np.asarray(c16), np.asarray(c32),
                                   atol=6e-3)
        np.testing.assert_allclose(np.asarray(a16), np.asarray(a32),
                                   atol=6e-3)
