"""End-to-end single-model training slice (BASELINE configs[0] scaled for
CPU): random-init store, render, L1+SSIM backward, Adam steps, refinement.
Asserts loss decreases and refinement keeps invariants."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.engine.train_step import (
    init_train_state, refine_step, train_step)
from street_gaussians_ns_tpu.models.gaussians import init_gaussians
from street_gaussians_ns_tpu.models.splatfacto import (
    SplatfactoConfig, forward, init_env_map)
from street_gaussians_ns_tpu.ops.render import RenderConfig

W, H = 48, 48
RCFG = RenderConfig(max_pairs=16384, max_per_tile=256, chunk=16)
CFG = SplatfactoConfig(
    random_init=True, num_random=256, random_scale=4.0, capacity=512,
    warmup_length=10, refine_every=20, stop_split_at=200,
    reset_alpha_every=5, env_map_res=32, sh_degree=1,
)


def make_setup(seed=0):
    store = init_gaussians(
        CFG.capacity, None, None, sh_degree=CFG.sh_degree,
        fourier_dim=CFG.fourier_features_dim, num_random=CFG.num_random,
        random_scale=CFG.random_scale, rng=jax.random.PRNGKey(seed))
    # Push gaussians in front of the camera (-z in OpenGL).
    params = dataclasses.replace(
        store.params, means=store.params.means - jnp.array([0., 0., 6.0]))
    store = dataclasses.replace(store, params=params)
    env = init_env_map(CFG)
    cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H, time=0.0)
    state = init_train_state(store, env, jax.random.PRNGKey(seed + 1))
    # A fittable target: render from a perturbed copy of the same scene.
    key = jax.random.PRNGKey(123)
    target, _ = forward(
        dataclasses.replace(
            params,
            features_dc=params.features_dc
            + jax.random.normal(key, params.features_dc.shape) * 0.3),
        store.active, cam, jnp.int32(0), CFG, RCFG, env_map=env,
        training=False)
    batch = {"image": jnp.clip(target["rgb"], 0, 1)}
    return state, cam, batch


@pytest.fixture(scope="module")
def setup():
    return make_setup()


class TestTrainStep:
    def test_loss_decreases(self, setup):
        state, cam, batch = setup
        step = jax.jit(lambda s: train_step(s, cam, batch, CFG, RCFG))
        s, m0 = step(state)
        losses = [float(m0["loss"])]
        for _ in range(30):
            s, m = step(s)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.8, losses
        assert np.isfinite(losses).all()

    def test_metrics_shape_and_psnr_improves(self, setup):
        state, cam, batch = setup
        step = jax.jit(lambda s: train_step(s, cam, batch, CFG, RCFG))
        s, m0 = step(state)
        for _ in range(25):
            s, m = step(s)
        assert float(m["psnr"]) > float(m0["psnr"])
        assert int(m["gaussian_count"]) == 256

    def test_stats_accumulate(self, setup):
        state, cam, batch = setup
        step = jax.jit(lambda s: train_step(s, cam, batch, CFG, RCFG))
        s, _ = step(state)
        s, _ = step(s)
        assert float(jnp.sum(s.store.xys_grad_norm)) > 0.0
        assert float(jnp.max(s.store.vis_counts)) >= 2.0
        assert float(jnp.max(s.store.max_2dsize)) > 0.0


class TestRefinement:
    def test_refine_runs_and_keeps_invariants(self, setup):
        state, cam, batch = setup
        step = jax.jit(lambda s: train_step(s, cam, batch, CFG, RCFG))
        ref = jax.jit(lambda s: refine_step(s, CFG, num_train_data=1,
                                            max_hw=jnp.float32(H)))
        s = state
        for i in range(1, 61):
            s, _ = step(s)
            if i % CFG.refine_every == 0:
                s, info = ref(s)
        n = int(s.store.num_active)
        assert 0 < n <= CFG.capacity
        # Active slots have finite params; moments of inactive slots zeroed.
        act = np.asarray(s.store.active)
        mu = np.asarray(s.opt["means"].mu)
        assert np.isfinite(np.asarray(s.store.params.means)[act]).all()
        assert np.all(mu[~act] == 0.0)

    def test_densify_creates_children_when_grads_high(self, setup):
        state, cam, batch = setup
        # Force huge stats so high_grads trips for all active gaussians.
        store = state.store
        store = dataclasses.replace(
            store,
            xys_grad_norm=jnp.where(store.active, 1e3, 0.0),
            vis_counts=jnp.where(store.active, 1.0, 0.0),
            max_2dsize=jnp.zeros_like(store.max_2dsize),
        )
        # refine sees step-1=50: past warmup (10), inside the densify window
        # (50 % reset_interval(100) > num_train_data(1) + refine_every(20)).
        s = dataclasses.replace(state, store=store, step=jnp.int32(51))
        s2, info = refine_step(s, CFG, num_train_data=1,
                               max_hw=jnp.float32(H))
        assert int(info["refine_splits_count"]) + int(info["refine_dups_count"]) > 0
        # Split originals culled, children placed; count changed accordingly.
        assert int(s2.store.num_active) != int(state.store.num_active) or \
            int(info["children_dropped"]) > 0

    def test_opacity_reset_clamps(self, setup):
        state, cam, batch = setup
        # reset fires when (step-1) % (reset_alpha_every*refine_every) == refine_every
        reset_step = CFG.reset_alpha_every * CFG.refine_every + CFG.refine_every
        s = dataclasses.replace(state, step=jnp.int32(reset_step + 1))
        s2, _ = refine_step(s, CFG, num_train_data=1, max_hw=jnp.float32(H))
        lim = float(jnp.log(jnp.float32(2 * CFG.cull_alpha_thresh)
                            / (1 - 2 * CFG.cull_alpha_thresh)))
        assert float(s2.store.params.opacities.max()) <= lim + 1e-5
        assert float(jnp.abs(s2.opt["opacities"].mu).max()) == 0.0


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
    # Only the CAPP budgeted parents die (their children were generated);
    # the other n_act - capp parents stay alive. Children fill the free
    # slots. With the old bug every split parent was culled and the
    # count collapsed to n_free + ... (112 here instead of 256).
    assert n_after == n_act - capp + n_free, (n_after, info)


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


def test_inactive_zero_rows_never_poison_state():
    """Regression: a store whose INACTIVE slots are all-zero (zero quats
    included — e.g. a hand-built or resized store) must train with finite
    state. The norm-at-zero backward used to emit NaN gradients for those
    rows and Adam wrote them into the params (caught by
    tools/soak_train.py at 1M scale)."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    import numpy as np
    from test_scene_graph import CFG, H, W, make_store, make_tracks
    from street_gaussians_ns_tpu.core.cameras import Camera
    from street_gaussians_ns_tpu.engine.scene_train_step import (
        init_scene_train_state, scene_train_step)
    from street_gaussians_ns_tpu.ops.render import RenderConfig

    store = make_store()
    # Zero EVERY inactive background row, including quats.
    act = store.background.active
    params = store.background.params
    zeroed = dc.replace(params, **{
        f: jnp.where(act.reshape((-1,) + (1,) * (getattr(params, f).ndim - 1)),
                     getattr(params, f), 0.0)
        for f in ("means", "scales", "quats", "features_dc",
                  "features_rest", "opacities")})
    store = dc.replace(store, background=dc.replace(
        store.background, params=zeroed))
    state = init_scene_train_state(store, jax.random.PRNGKey(0))
    cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                      time=1.0)
    batch = {"image": jnp.full((H, W, 3), 0.4)}
    rcfg = RenderConfig(max_pairs=16384, max_per_tile=128, chunk=16)
    step = jax.jit(lambda s: scene_train_step(s, make_tracks(), cam, batch,
                                              CFG, rcfg))
    for _ in range(3):
        state, m = step(state)
    assert np.isfinite(float(m["loss"]))
    for f in ("means", "scales", "quats", "features_dc", "features_rest",
              "opacities"):
        x = np.asarray(getattr(state.store.background.params, f))
        assert np.isfinite(x).all(), f
