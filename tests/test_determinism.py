"""Determinism double-run check mode (SURVEY §5 race-detection analogue).

The reference's only determinism affordance is gridcreater's
integer-accumulation forward (/root/reference/utils/grid_utils.py:39-57,
needed because CUDA float atomics are non-deterministic).  This framework
is sort-based/atomic-free by construction; the check mode re-dispatches
the jitted step from identical inputs and requires bit-identical results.
"""
import pytest

from splatco_tpu.config import (ModelConfig, OptimizationConfig,
                                PipelineConfig)
from splatco_tpu.data.scene import Scene
from splatco_tpu.train.loop import Trainer
from splatco_tpu.utils.synthetic import write_blender_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scene_det"))
    write_blender_dataset(path, n_views=4, n_pts=120, width=64, height=48)
    return path


@pytest.mark.slow
def test_double_run_is_bit_identical(dataset):
    cfg = ModelConfig(source_path=dataset, model_path="", feat_dim=16,
                      n_offsets=4, voxel_size=0.05, plane_size=64,
                      num_channels=9, appearance_dim=0, contractor=True,
                      white_background=True, eval=True)
    opt = OptimizationConfig(update_from=100, update_until=200,
                             start_stat=100)
    scene = Scene(cfg, shuffle=False, write_artifacts=False)
    tr = Trainer(cfg, opt, PipelineConfig(mv=2), backend="dense",
                 test_iterations=(), save_iterations=(),
                 checkpoint_iterations=(), no_multilevel=True,
                 determinism_check=True, determinism_every=2)
    tr.setup(scene, seed=0)
    # raises RuntimeError on any double-run mismatch (checked at iters 2, 4)
    tr.train(iterations=4, progress_every=2)
