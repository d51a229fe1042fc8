"""Full-pipeline integration: parse synthetic clip -> Trainer (scene graph
with 1 tracked object) -> checkpoint -> resume -> eval CLI -> export CLI ->
render CLI. The CPU-scale analog of the reference's end-to-end flow."""
import json
from pathlib import Path

import numpy as np
import pytest

from street_gaussians_ns_tpu.data.datamanager import DataManagerConfig
from street_gaussians_ns_tpu.data.dataparser import DataParserConfig
from street_gaussians_ns_tpu.engine.setup import eval_setup
from street_gaussians_ns_tpu.engine.trainer import Trainer, TrainerConfig
from street_gaussians_ns_tpu.models.scene_graph import SceneGraphConfig
from street_gaussians_ns_tpu.models.splatfacto import SplatfactoConfig

from test_data import write_clip


def small_configs(tmp_path, out_dir):
    data_cfg = DataParserConfig(data=tmp_path, load_dynamic_annotations=True,
                                train_split_fraction=0.5)
    scene_cfg = SceneGraphConfig(
        base=SplatfactoConfig(sh_degree=1, env_map_res=16),
        background=SplatfactoConfig(
            capacity=256, warmup_length=5, refine_every=10, stop_split_at=50,
            reset_alpha_every=3, fourier_features_dim=1, sh_degree=1),
        object_template=SplatfactoConfig(
            capacity=64, warmup_length=5, refine_every=10, stop_split_at=50,
            reset_alpha_every=3, fourier_features_dim=5, sh_degree=1,
            num_random=32),
    )
    trainer_cfg = TrainerConfig(
        max_num_iterations=12, steps_per_save=6, steps_per_eval_image=10,
        background_capacity=256, object_capacity=16384, max_pairs=16384,
        output_dir=out_dir, render_impl="chunked")
    dm_cfg = DataManagerConfig(undistort=False, cache_workers=2)
    return data_cfg, scene_cfg, trainer_cfg, dm_cfg


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clip")
    write_clip(tmp)
    return tmp


class TestPipeline:
    def test_train_checkpoint_resume_eval_export_render(self, clip,
                                                        tmp_path_factory):
        out = tmp_path_factory.mktemp("run")
        cfgs = small_configs(clip, out)
        trainer = Trainer(*cfgs)
        assert trainer.scene.annotations.num_objects == 1
        state = trainer.train()
        assert int(state.step) == 12
        ckpts = sorted((out / "checkpoints").glob("step-*.ckpt.npz"))
        assert len(ckpts) >= 2  # saved at 6 and 12
        metrics = [json.loads(l) for l in
                   open(out / "metrics.jsonl").read().splitlines()]
        assert any("train/loss" in m for m in metrics)
        assert np.isfinite([m["train/loss"] for m in metrics
                            if "train/loss" in m]).all()

        # Resume: a new Trainer picks up from the checkpoint.
        trainer2 = Trainer(*cfgs)
        assert trainer2.start_step == 12

        # eval CLI — lpips defaults on (random-feature fallback, labelled)
        # and chamfer runs against the clip's aggregate LiDAR, making
        # eval_output.json a schema superset of the reference's
        # (eval.py:56-64 + geometric_metric.py:100).
        from street_gaussians_ns_tpu.scripts.eval import main as eval_main
        eval_main(["--load-dir", str(out), "--compute-chamfer",
                   "--aggregate-lidar",
                   str(clip / "aggregate_lidar/dynamic_objects/veh1.ply")])
        full = json.load(open(out / "eval_output.json"))
        res = full["results"]
        assert "psnr" in res and "ssim" in res and "fps" in res
        assert np.isfinite(res["psnr"])
        assert "lpips" in res and np.isfinite(res["lpips"])
        assert full["lpips_net"] == "vgg16-random-features-seed0"
        assert np.isfinite(res["lidar_chamfer_distance_avg"])
        assert (res["lidar_chamfer_distance_avg"]
                == 0.5 * (res["lidar_chamfer_distance_1"]
                          + res["lidar_chamfer_distance_2"]))

        # export CLI
        from street_gaussians_ns_tpu.scripts.export import main as export_main
        exp = out / "exports"
        export_main(["--load-dir", str(out), "--output-dir", str(exp)])
        assert (exp / "point_cloud_background.ply").exists()
        assert (exp / "point_cloud_object_veh1.ply").exists()
        from street_gaussians_ns_tpu.data.ply_io import read_ply
        v = read_ply(exp / "point_cloud_background.ply")
        assert len(v["x"]) > 0

        # render CLI (images to disk)
        from street_gaussians_ns_tpu.scripts.render import main as render_main
        rdir = out / "renders"
        render_main(["--load-dir", str(out), "--output-path", str(rdir),
                     "--rendered-output-names", "rgb", "depth",
                     "accumulation"])
        pngs = list((rdir / "rgb").glob("*.png"))
        assert len(pngs) == trainer.dm.num_eval
