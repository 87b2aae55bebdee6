"""Full-pipeline integration: synthetic dataset -> Scene -> Trainer."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from splatco_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from splatco_tpu.data.scene import Scene
from splatco_tpu.train.loop import Trainer
from splatco_tpu.utils.synthetic import write_blender_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scene"))
    write_blender_dataset(path, n_views=8, n_pts=250, width=96, height=64)
    return path


def test_scene_loads(dataset):
    cfg = ModelConfig(source_path=dataset, model_path="", eval=True)
    scene = Scene(cfg, shuffle=False, write_artifacts=False)
    assert len(scene.train_cameras()) == 6
    assert len(scene.test_cameras()) == 2
    cam = scene.train_cameras()[0]
    assert cam.image.shape == (3, 64, 96)
    assert scene.points.shape[1] == 3
    assert np.isfinite(scene.cameras_extent)


def test_training_improves_psnr(dataset, tmp_path):
    cfg = ModelConfig(source_path=dataset, model_path=str(tmp_path / "out"),
                      feat_dim=16, n_offsets=4, voxel_size=0.05,
                      plane_size=64, num_channels=9, appearance_dim=0,
                      contractor=True, white_background=True, eval=True)
    opt = OptimizationConfig(update_from=10, update_interval=20,
                             update_until=49, start_stat=5)
    pipe = PipelineConfig(mv=2)
    scene = Scene(cfg, shuffle=False)
    tr = Trainer(cfg, opt, pipe, backend="dense",
                 test_iterations=(1, 48), save_iterations=(48,),
                 no_multilevel=True)
    tr.setup(scene, seed=0)
    tr.train(iterations=48, progress_every=20)

    evals = [m for m in tr.metrics_log if "test_psnr" in m]
    assert len(evals) >= 2
    first, last = evals[0]["test_psnr"], evals[-1]["test_psnr"]
    assert last > first, (first, last)
    # checkpoint artifacts written
    pc = os.path.join(cfg.model_path, "point_cloud", "iteration_48")
    assert os.path.exists(os.path.join(pc, "point_cloud.ply"))
    assert os.path.exists(os.path.join(pc, "checkpoints.npz"))
    assert os.path.exists(os.path.join(cfg.model_path, "cfg_args.json"))
    assert os.path.exists(os.path.join(cfg.model_path, "cameras.json"))


def test_checkpoint_roundtrip(dataset, tmp_path):
    from splatco_tpu.models.splatco import init_model
    from splatco_tpu.train import checkpoint as ckpt
    import jax

    cfg = ModelConfig(source_path=dataset, model_path=str(tmp_path / "m"),
                      feat_dim=16, n_offsets=4, voxel_size=0.05,
                      plane_size=64, num_channels=9, appearance_dim=0)
    scene = Scene(cfg, shuffle=False, write_artifacts=False)
    params, state = init_model(jax.random.key(0), cfg, scene.points)
    ckpt.save_model_checkpoint(cfg.model_path, 1, params,
                               np.asarray(state.active),
                               meta={"iteration": 1})
    assert ckpt.latest_iteration(cfg.model_path) == 1
    params2, active2, meta = ckpt.load_model_checkpoint(
        cfg.model_path, 1, params,
        capacity=params["anchors"]["anchor"].shape[0])
    assert meta["iteration"] == 1
    n = int(np.asarray(state.active).sum())
    assert int(np.asarray(active2).sum()) == n
    np.testing.assert_allclose(
        np.asarray(params2["anchors"]["anchor"])[:n],
        np.asarray(params["anchors"]["anchor"])[:n], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params2["anchors"]["offsets"])[:n],
        np.asarray(params["anchors"]["offsets"])[:n], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params2["decoders"]["color"][0]["w"]),
        np.asarray(params["decoders"]["color"][0]["w"]), atol=1e-7)


def test_trainer_classed_binning_tunes_and_trains(dataset, tmp_path):
    """Pallas backend with the class-packed binner (interpret mode on
    CPU): the measuring step seeds class_spec from the histogram, the
    re-jitted classed step trains, and no overflow fires."""
    from splatco_tpu.config import (ModelConfig, OptimizationConfig,
                                    PipelineConfig)
    from splatco_tpu.data.scene import Scene
    from splatco_tpu.train.loop import Trainer

    cfg = ModelConfig(source_path=dataset, model_path=str(tmp_path / "m"),
                      feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9, appearance_dim=0,
                      contractor=True, eval=True)
    opt = OptimizationConfig(update_from=1000, update_until=1001,
                             start_stat=1000)
    pipe = PipelineConfig(mv=2)
    scene = Scene(cfg, shuffle=False, write_artifacts=False)
    tr = Trainer(cfg, opt, pipe, backend="pallas", binning="classed",
                 test_iterations=(), save_iterations=(),
                 checkpoint_iterations=(), no_multilevel=True)
    tr.setup(scene, seed=3)
    log = tr.train(iterations=5, progress_every=1)
    assert tr.class_spec is not None
    kps = [kp for kp, _ in tr.class_spec]
    assert kps == sorted(kps) and kps[-1] == cfg.kmax
    n = tr.params["anchors"]["anchor"].shape[0] * cfg.n_offsets
    assert sum(b for _, b in tr.class_spec) >= n
    assert all(np.isfinite(m["loss"]) for m in log if "loss" in m
               and m["loss"] is not None)
