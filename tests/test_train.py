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
