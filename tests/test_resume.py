"""Full-state checkpoint/resume: train(2N) == train(N) -> save -> restore
-> train(N) exactly (the capability the reference's Q8-broken restore
never delivered, /root/reference/scene/gaussian_model.py:368-388)."""
import os

import jax
import numpy as np
import pytest

from splatco_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from splatco_tpu.data.scene import Scene
from splatco_tpu.train.loop import Trainer
from splatco_tpu.utils.synthetic import write_blender_dataset

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("scene_resume"))
    write_blender_dataset(path, n_views=6, n_pts=150, width=64, height=64)
    return path


def make_trainer(dataset, model_path, ckpt_iters=()):
    cfg = ModelConfig(source_path=dataset, model_path=model_path,
                      feat_dim=8, n_offsets=4, voxel_size=0.05,
                      plane_size=32, num_channels=9, appearance_dim=0,
                      contractor=True, eval=True)
    # densify inside the window so optimizer/stat state is non-trivial
    opt = OptimizationConfig(update_from=2, update_interval=4,
                             update_until=20, start_stat=1)
    pipe = PipelineConfig(mv=2)
    scene = Scene(cfg, shuffle=False, write_artifacts=False)
    tr = Trainer(cfg, opt, pipe, backend="dense", test_iterations=(),
                 save_iterations=(), checkpoint_iterations=ckpt_iters,
                 no_multilevel=True)
    tr.setup(scene, seed=7)
    return tr


def test_resume_is_exact(dataset, tmp_path):
    n, m = 6, 6

    # ---- run A: straight through 2N ----------------------------------
    tr_a = make_trainer(dataset, str(tmp_path / "a"))
    tr_a.train(iterations=n + m, progress_every=1000)

    # ---- run B: N steps, checkpoint ----------------------------------
    tr_b = make_trainer(dataset, str(tmp_path / "b"), ckpt_iters=(n,))
    tr_b.train(iterations=n, progress_every=1000)
    assert os.path.exists(str(tmp_path / "b" / f"chkpnt{n}.npz"))

    # ---- run C: fresh trainer, restore, continue to 2N ---------------
    tr_c = make_trainer(dataset, str(tmp_path / "b"))
    restored = tr_c.restore()
    assert restored == n
    tr_c.train(iterations=n + m, progress_every=1000)

    # params identical (dense backend on CPU is deterministic)
    leaves_a = jax.tree_util.tree_leaves(tr_a.params)
    leaves_c = jax.tree_util.tree_leaves(tr_c.params)
    assert len(leaves_a) == len(leaves_c)
    for a, c in zip(leaves_a, leaves_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)
    # active masks identical
    np.testing.assert_array_equal(np.asarray(tr_a.mstate.active),
                                  np.asarray(tr_c.mstate.active))
    # optimizer state identical too (true full-state resume)
    for a, c in zip(jax.tree_util.tree_leaves(tr_a.opt_state),
                    jax.tree_util.tree_leaves(tr_c.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-7)


def test_grow_preserves_adam_moments(dataset, tmp_path):
    """Capacity regrowth must keep optimizer moments for pre-existing rows
    bit-exactly and zero-init only the new rows (reference
    cat_tensors_to_optimizer, /root/reference/scene/gaussian_model.py:714-760)."""
    tr = make_trainer(dataset, str(tmp_path / "g"))
    tr.train(iterations=4, progress_every=1000)

    before = jax.tree_util.tree_leaves_with_path(tr.opt_state)
    cap = tr.params["anchors"]["anchor"].shape[0]
    tr._grow(cap * 2)
    after = dict(jax.tree_util.tree_leaves_with_path(tr.opt_state))

    checked_grown = 0
    for path, old in before:
        new = after[path]
        old = np.asarray(old)
        new_np = np.asarray(new)
        if old.shape == new_np.shape:
            np.testing.assert_array_equal(old, new_np, err_msg=str(path))
        else:
            checked_grown += 1
            np.testing.assert_array_equal(old, new_np[:old.shape[0]],
                                          err_msg=str(path))
            assert not np.any(new_np[old.shape[0]:])
    # anchor param groups have mu+nu leaves that grew
    assert checked_grown >= 8

    # training continues cleanly after the regrowth
    tr.train(iterations=6, progress_every=1000)
