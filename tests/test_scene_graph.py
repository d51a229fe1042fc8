"""Scene-graph tests: box interpolation, object->world transform, flat
composition, forward outputs, losses, and the scene train/refine steps."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from street_gaussians_ns_tpu.core import quaternions as quat
from street_gaussians_ns_tpu.core.cameras import Camera
from street_gaussians_ns_tpu.engine.scene_train_step import (
    init_scene_train_state, scene_refine_step, scene_train_step)
from street_gaussians_ns_tpu.models.gaussians import init_gaussians
from street_gaussians_ns_tpu.models.scene_graph import (
    ObjectTracks, SceneGraphConfig, forward_scene, init_scene_graph_store,
    interpolate_boxes, object2world, scene_loss_dict)
from street_gaussians_ns_tpu.models.splatfacto import SplatfactoConfig
from street_gaussians_ns_tpu.ops.render import RenderConfig

W, H = 48, 32
RCFG = RenderConfig(max_pairs=16384, max_per_tile=128, chunk=16)
CFG = SceneGraphConfig(
    base=SplatfactoConfig(sh_degree=1, env_map_res=16, use_sky_sphere=True),
    background=SplatfactoConfig(
        random_init=True, num_random=128, random_scale=4.0, capacity=256,
        warmup_length=10, refine_every=20, stop_split_at=100,
        reset_alpha_every=5, fourier_features_dim=1, sh_degree=1,
        cull_alpha_thresh=0.02),
    object_template=SplatfactoConfig(
        random_init=True, num_random=32, capacity=64, warmup_length=10,
        refine_every=20, stop_split_at=100, reset_alpha_every=5,
        fourier_features_dim=5, sh_degree=1, cull_alpha_thresh=0.005),
)
O, F = 2, 4


def make_tracks():
    times = jnp.array([0.0, 1.0, 2.0, 3.0])
    centers = jnp.stack([
        jnp.stack([jnp.array([t - 1.5, 0.0, -6.0]) for t in range(F)]),
        jnp.stack([jnp.array([0.5, 1.0 - 0.2 * t, -8.0]) for t in range(F)]),
    ], axis=1)  # (F, O, 3)
    quats = jnp.tile(jnp.array([1.0, 0, 0, 0]), (F, O, 1))
    valid = jnp.ones((F, O), bool).at[3, 1].set(False)  # obj 1 leaves at t=3
    return ObjectTracks(
        times=times, centers=centers, quats=quats, valid=valid,
        sizes=jnp.ones((O, 3)),
        obj_first=jnp.array([0.0, 0.0]), obj_last=jnp.array([3.0, 2.0]))


def make_store(seed=0):
    bg = init_gaussians(CFG.background.capacity, None, None,
                        sh_degree=1, fourier_dim=1,
                        num_random=CFG.background.num_random,
                        random_scale=4.0, rng=jax.random.PRNGKey(seed))
    bg = dataclasses.replace(
        bg, params=dataclasses.replace(
            bg.params, means=bg.params.means - jnp.array([0., 0., 10.0])))
    objs = [init_gaussians(CFG.object_template.capacity, None, None,
                           sh_degree=1, fourier_dim=5,
                           num_random=CFG.object_template.num_random,
                           random_scale=0.5, rng=jax.random.PRNGKey(seed + i))
            for i in range(1, O + 1)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *objs)
    return init_scene_graph_store(bg, stacked, make_tracks(), CFG)


class TestBoxInterpolation:
    def test_exact_frame(self):
        tr = make_tracks()
        b = interpolate_boxes(tr, jnp.float32(1.0))
        np.testing.assert_allclose(b.centers[0], [-0.5, 0.0, -6.0], atol=1e-6)
        assert bool(b.visible.all())

    def test_midpoint_lerp_and_intersection(self):
        tr = make_tracks()
        b = interpolate_boxes(tr, jnp.float32(2.5))
        np.testing.assert_allclose(b.centers[0], [1.0, 0.0, -6.0], atol=1e-6)
        # Object 1 invalid at t=3 -> intersection drops it mid-segment.
        assert bool(b.visible[0]) and not bool(b.visible[1])

    def test_exact_frame_uses_single_frame_validity(self):
        tr = make_tracks()
        b = interpolate_boxes(tr, jnp.float32(2.0))  # obj1 valid at frame 2
        assert bool(b.visible[1])

    def test_out_of_range_invisible(self):
        tr = make_tracks()
        for t in (-0.5, 3.5):
            b = interpolate_boxes(tr, jnp.float32(t))
            assert not bool(b.visible.any())

    def test_slerp_rotation(self):
        tr = make_tracks()
        q90 = jnp.array([np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0])
        quats = tr.quats.at[1, 0].set(q90)
        tr = dataclasses.replace(tr, quats=quats)
        b = interpolate_boxes(tr, jnp.float32(0.5))
        # Halfway: 45 degrees about y.
        expect = jnp.array([np.cos(np.pi / 8), 0.0, np.sin(np.pi / 8), 0.0])
        np.testing.assert_allclose(b.quats[0], expect, atol=1e-5)

    def test_bbox_delta_applied_at_exact_frame_only(self):
        tr = make_tracks()
        dc = jnp.zeros((F, O, 3)).at[1, 0].set(jnp.array([9.0, 0.0, 0.0]))
        dy = jnp.zeros((F, O))
        b_exact = interpolate_boxes(tr, jnp.float32(1.0), dc, dy)
        b_mid = interpolate_boxes(tr, jnp.float32(1.5), dc, dy)
        assert abs(float(b_exact.centers[0, 0]) - (-0.5 + 9.0)) < 1e-5
        assert abs(float(b_mid.centers[0, 0]) - 0.0) < 1e-5

    def test_object2world(self):
        means = jnp.array([[[1.0, 0.0, 0.0]]])       # (O=1, C=1, 3)
        quats_g = jnp.array([[[1.0, 0.0, 0.0, 0.0]]])
        q90z = jnp.array([[np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]])
        boxes = interpolate_boxes(
            dataclasses.replace(
                make_tracks(),
                centers=jnp.tile(jnp.array([10.0, 0, 0]), (F, O, 1)),
                quats=jnp.tile(q90z, (F, O, 1))),
            jnp.float32(0.0))
        m, q = object2world(means, quats_g, dataclasses.replace(
            boxes, centers=boxes.centers[:1], quats=boxes.quats[:1]))
        # 90deg about z: (1,0,0) -> (0,1,0), then +10 x.
        np.testing.assert_allclose(m[0, 0], [10.0, 1.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(q[0, 0], q90z[0], atol=1e-6)


class TestSceneForward:
    def test_forward_outputs(self):
        store = make_store()
        cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                          time=1.0)
        outputs, rout, boxes = forward_scene(
            store, make_tracks(), cam, jnp.int32(0), CFG, RCFG,
            rng=jax.random.PRNGKey(0), training=False)
        for k in ("rgb", "accumulation", "depth", "sky", "object_acc",
                  "background_acc"):
            assert k in outputs, k
        assert outputs["rgb"].shape == (H, W, 3)
        # Objects sit right in front of the camera: object_acc nonzero.
        assert float(outputs["object_acc"].max()) > 0.1
        assert float(outputs["background_acc"].max()) > 0.1

    @pytest.mark.slow   # eval_extras runs ~6 extra full renders (~20 s)
    def test_forward_eval_extras_outputs(self):
        store = make_store()
        cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                          time=1.0)
        outputs, _, _ = forward_scene(
            store, make_tracks(), cam, jnp.int32(0), CFG, RCFG,
            rng=jax.random.PRNGKey(0), training=False, eval_extras=True)
        for k in ("background_rgb", "object_rgb"):
            assert k in outputs, k

    def test_invisible_time_renders_background_only(self):
        store = make_store()
        cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                          time=99.0)  # out of track range
        outputs, _, _ = forward_scene(
            store, make_tracks(), cam, jnp.int32(0), CFG, RCFG,
            training=False)
        np.testing.assert_allclose(np.asarray(outputs["object_acc"]), 0.0,
                                   atol=1e-6)

    def test_loss_dict_entropy_gated_by_step(self):
        store = make_store()
        cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                          time=1.0)
        outputs, _, _ = forward_scene(store, make_tracks(), cam, jnp.int32(0),
                                      CFG, RCFG, training=False)
        batch = {"image": jnp.zeros((H, W, 3))}
        l_early = scene_loss_dict(outputs, batch, CFG, jnp.int32(0))
        l_late = scene_loss_dict(outputs, batch, CFG, jnp.int32(101))
        assert float(l_early["object_acc_entropy_loss"]) == 0.0
        assert float(l_late["object_acc_entropy_loss"]) > 0.0


class TestSceneTraining:
    @pytest.mark.slow
    def test_train_and_refine(self):
        store = make_store()
        tracks = make_tracks()
        cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                          time=1.0)
        state = init_scene_train_state(store, jax.random.PRNGKey(0))
        outputs, _, _ = forward_scene(store, tracks, cam, jnp.int32(0), CFG,
                                      RCFG, training=False)
        batch = {"image": jnp.clip(outputs["rgb"] * 0.8 + 0.1, 0, 1)}

        step = jax.jit(lambda s: scene_train_step(s, tracks, cam, batch, CFG,
                                                  RCFG))
        ref = jax.jit(lambda s: scene_refine_step(s, CFG, num_train_data=1,
                                                  max_hw=jnp.float32(H)))
        s, m0 = step(state)
        losses = [float(m0["loss"])]
        for i in range(2, 32):
            s, m = step(s)
            losses.append(float(m["loss"]))
            if i % 20 == 0:
                s, info = ref(s)
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()
        assert int(s.store.background.num_active) > 0
        assert int(s.store.objects.num_active) > 0
        # env map learned something
        assert float(jnp.abs(s.store.env_map - 0.5).max()) > 0.0


class TestCameraOptAccum:
    def test_adam_accumulation_semantics(self):
        """accum_steps sums grads and applies one Adam step per window;
        the applied step equals a plain Adam step on the summed grad."""
        from street_gaussians_ns_tpu.engine.optimizers import (
            AdamConfig, adam_update, init_adam)
        import dataclasses as dc
        cfg = AdamConfig(lr=1e-2, accum_steps=3)
        p0 = jnp.asarray([1.0, -2.0, 0.5])
        st = init_adam(p0, accum_steps=3)
        grads = [jnp.asarray([0.1, 0.2, -0.3]),
                 jnp.asarray([0.0, -0.1, 0.1]),
                 jnp.asarray([0.2, 0.0, 0.0])]
        p, s = p0, st
        for i, g in enumerate(grads):
            p, s = adam_update(g, s, p, jnp.float32(cfg.lr), cfg)
            if i < 2:                       # no step applied yet
                np.testing.assert_array_equal(np.asarray(p), np.asarray(p0))
        # After 3 calls: equals one plain Adam step on the summed grad.
        ref_p, _ = adam_update(sum(grads), init_adam(p0), p0,
                               jnp.float32(cfg.lr),
                               dc.replace(cfg, accum_steps=1))
        np.testing.assert_allclose(np.asarray(p), np.asarray(ref_p),
                                   rtol=1e-6)
        # buffer reset after the applied step
        np.testing.assert_allclose(np.asarray(s.acc), 0.0, atol=0)
        assert int(s.count) == 1 and int(s.calls) == 3

    def test_scene_step_with_camera_opt(self):
        import dataclasses as dc
        from street_gaussians_ns_tpu.models.camera_opt import (
            CameraOptConfig, init_camera_opt)
        store = make_store()
        tracks = make_tracks()
        cam = Camera.make(40.0, 40.0, W / 2, H / 2, jnp.eye(3, 4), W, H,
                          time=1.0)
        cfg = dc.replace(CFG, camera_opt_mode="SO3xR3", num_cameras=4)
        cam_opt = init_camera_opt(CameraOptConfig("SO3xR3", 4))
        state = init_scene_train_state(store, jax.random.PRNGKey(0),
                                       camera_opt=cam_opt)
        outputs, _, _ = forward_scene(store, tracks, cam, jnp.int32(0), cfg,
                                      RCFG, training=False)
        batch = {"image": jnp.clip(outputs["rgb"] * 0.8 + 0.1, 0, 1)}
        step = jax.jit(lambda s: scene_train_step(
            s, tracks, cam, batch, cfg, RCFG,
            camera_index=jnp.int32(2)))
        s, m = step(state)
        assert np.isfinite(float(m["loss"]))
        # accumulation window = 100: params unchanged after 1 step, but
        # the accumulator saw this step's gradient.
        np.testing.assert_array_equal(np.asarray(s.camera_opt),
                                      np.asarray(cam_opt))
        acc = np.asarray(s.opt["camera_opt"].acc)
        assert np.abs(acc[2]).max() > 0.0
        assert np.abs(np.delete(acc, 2, axis=0)).max() == 0.0
