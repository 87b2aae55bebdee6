"""Trainer auto-escalation of kmax on tile-rect clipping (VERDICT r4 #6).

The reference CUDA rasterizer has no tiles-per-gaussian cap (SURVEY §2.2
N1); this framework's kmax cap clips rects and silently approximates the
fringes.  The trainer must treat a nonzero clip counter like slot-budget
overflow: double kmax (capped) and re-jit, so steady state is exact.
tests/test_clipping.py pins that the raised-kmax render restores oracle
exactness; here we pin the controller itself.
"""
import logging

from splatco_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from splatco_tpu.train.loop import Trainer


def _controller(binning="classed", kmax=12, cap=32):
    tr = Trainer(ModelConfig(kmax=kmax), OptimizationConfig(),
                 PipelineConfig(), backend="pallas", binning=binning,
                 kmax_cap=cap)
    # the minimal state _tune_kmax_pack touches (normally set by setup())
    tr.logger = logging.getLogger("test_kmax_escalation")
    tr.class_spec = ((1, 64), (2, 32), (4, 16), (8, 8), (kmax, 8))
    tr.kmax_pack = 4
    tr._kp_floor = 1
    tr._spec_floor = {kmax: 8}
    tr._clip_warned = False
    tr._seeded = []
    tr._seed_class_spec = lambda: tr._seeded.append(True)
    return tr


def test_classed_escalates_and_reseeds():
    tr = _controller(binning="classed")
    tr._tune_kmax_pack({"num_clipped": 3, "num_overflow": 0,
                        "max_slots": 4})
    assert tr.cfg.kmax == 24
    assert tr.class_spec is None and tr._seeded == [True]
    # the last-class budget floor follows the kmax bucket rename
    assert tr._spec_floor == {24: 8}


def test_packed_escalates_and_remeasures():
    tr = _controller(binning="packed")
    tr._tune_kmax_pack({"num_clipped": 1, "num_overflow": 0,
                        "max_slots": 4})
    assert tr.cfg.kmax == 24
    assert tr.kmax_pack is None  # re-measure under the new kmax


def test_capped_escalation_falls_back_to_warning():
    tr = _controller(binning="classed", kmax=32, cap=32)
    spec_before = tr.class_spec
    tr._tune_kmax_pack({"num_clipped": 5000, "num_overflow": 0,
                        "max_slots": 4})
    assert tr.cfg.kmax == 32  # at cap: no escalation
    assert tr.class_spec == spec_before
    assert tr._clip_warned  # the once-only warning fired instead


def test_no_clipping_no_escalation():
    tr = _controller(binning="classed")
    tr._tune_kmax_pack({"num_clipped": 0, "num_overflow": 0,
                        "max_slots": 4})
    assert tr.cfg.kmax == 12 and not tr._seeded
