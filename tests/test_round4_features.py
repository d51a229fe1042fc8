"""Round-4 regression surface: refinement parent-budget cull fix,
max_tile_count truncation metric, cubemap dirs-grad auto mode.
(Split from test_train.py so the xdist loadscope scheduler can pack the
fixture-heavy train module separately.)"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_train import CFG, RCFG, H, W, make_setup
from street_gaussians_ns_tpu.engine.train_step import train_step


def test_unbudgeted_split_parents_survive():
    """Regression (round-3 advisor, medium): split parents past the
    CAPP = cap/16 parent-compaction budget never generate children, so
    they must NOT be culled — otherwise gaussians vanish without
    replacement even when free slots exist."""
    from street_gaussians_ns_tpu.models import refinement

    cap = 512           # capp = max(256, 512 // 16) = 256
    capp = 256
    n_act = 400         # > capp: 144 split parents are unbudgeted
    cfg = dataclasses.replace(
        CFG, capacity=cap, num_random=n_act, warmup_length=10,
        refine_every=20, stop_split_at=200, reset_alpha_every=5)
    from street_gaussians_ns_tpu.models.gaussians import init_gaussians
    store = init_gaussians(
        cap, None, None, sh_degree=cfg.sh_degree,
        fourier_dim=cfg.fourier_features_dim, num_random=n_act,
        random_scale=4.0, rng=jax.random.PRNGKey(0))
    # Every active gaussian a SPLIT candidate: huge positional-grad
    # stats + world scale above densify_size_thresh.
    store = dataclasses.replace(
        store,
        params=dataclasses.replace(
            store.params,
            scales=jnp.full_like(store.params.scales,
                                 jnp.log(10 * cfg.densify_size_thresh)),
            # High opacity so no cull by alpha.
            opacities=jnp.full_like(store.params.opacities, 3.0)),
        xys_grad_norm=jnp.where(store.active, 1e3, 0.0),
        vis_counts=jnp.where(store.active, 1.0, 0.0),
        max_2dsize=jnp.zeros_like(store.max_2dsize),
    )
    # step 51: past warmup, inside the densify window.
    store2, surgery, info = refinement.refine(
        store, jnp.int32(51), cfg, num_train_data=1,
        max_hw=jnp.float32(H), rng=jax.random.PRNGKey(1))
    n_splits = int(info["refine_splits_count"])
    assert n_splits == n_act
    n_free = cap - n_act                      # free slots pre-scatter
    n_after = int(jnp.sum(store2.active))
    # A split parent dies ONLY when its whole replacement landed: with
    # parent-major child placement, n_free // nsamps parents (56 here)
    # get both children placed and are culled; every other parent —
    # past the CAPP budget OR slot-budget-starved — stays alive. With
    # the round-3 bug every split parent was culled (count collapsed to
    # n_free = 112); with the round-4a fix parents past CAPP survived
    # but slot-starved ones still vanished.
    n_replaced = n_free // 2                  # nsamps = 2
    assert n_after == n_act - n_replaced + n_free, (n_after, info)


def test_max_tile_count_metric_reports_truncation():
    """VERDICT r3 weak#7: the densest-tile counter must be surfaced so
    the portable (chunked/scan) paths' max_per_tile truncation is
    visible. Undersized max_per_tile => metric exceeds it."""
    state, cam, batch = make_setup()
    rcfg = dataclasses.replace(RCFG, max_per_tile=4)
    step = jax.jit(lambda s: train_step(s, cam, batch, CFG, rcfg))
    _, m = step(state)
    assert int(m["max_tile_count"]) > 4
    # And the bins property agrees with a direct computation.
    from street_gaussians_ns_tpu.models.splatfacto import forward as fwd
    _, rout = fwd(state.store.params, state.store.active, cam,
                  jnp.int32(0), CFG, rcfg, env_map=state.env_map,
                  training=False)
    assert int(rout.bins.max_tile_count) == int(
        jnp.max(rout.bins.tile_count))


def test_cubemap_auto_keeps_dirs_gradients():
    """Regression (round-3 advisor): method='auto' must not silently
    stop-gradient the sampling geometry when the caller needs gradients
    through `dirs` (camera-pose optimization through the sky)."""
    from street_gaussians_ns_tpu.ops.cubemap import sample_cubemap

    cube = jnp.arange(6 * 8 * 8 * 3, dtype=jnp.float32).reshape(
        6, 8, 8, 3) / (6 * 8 * 8 * 3)
    dirs = jnp.array([[0.3, 0.9, 0.2], [-0.8, 0.1, 0.5]])

    def f(d, **kw):
        return jnp.sum(sample_cubemap(cube, d, **kw) ** 2)

    # The matmul path stop-gradients the geometry (zero dirs grad) —
    # which is exactly why auto must avoid it when dirs_grad=True.
    g_mm = jax.grad(lambda d: f(d, method="matmul"))(dirs)
    assert float(jnp.abs(g_mm).max()) == 0.0
    g = jax.grad(lambda d: f(d, dirs_grad=True))(dirs)
    assert float(jnp.abs(g).max()) > 0.0
    # Values agree between the two paths (same math, different movement).
    v_mm = f(dirs, method="matmul")
    v_g = f(dirs, method="gather")
    np.testing.assert_allclose(np.asarray(v_mm), np.asarray(v_g),
                               rtol=1e-5)


