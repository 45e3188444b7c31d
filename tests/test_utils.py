"""Meters / monitoring / vistool tests."""

import os

import numpy as np

from handnet_tpu.utils.meters import (AverageMeter, AverageMeters,
                                      MetricLogger, SmoothedValue)
from handnet_tpu.utils.monitoring import (Metrics, Monitor, get_logs,
                                          log_errors)
from handnet_tpu.utils.vistool import VisualUtil, vis_minibatch


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2
    m.update(5.0, n=2)
    assert m.avg == (1 + 3 + 10) / 4


def test_average_meters_dict():
    ms = AverageMeters()
    ms.update({"a": 1.0, "b": 2.0})
    ms.update({"a": 3.0})
    avg = ms.averages()
    assert avg["a"] == 2.0 and avg["b"] == 2.0


def test_smoothed_value_window():
    s = SmoothedValue(window_size=3)
    for v in (1, 2, 3, 4):
        s.update(v)
    assert s.median == 3.0      # window keeps (2, 3, 4)
    assert s.global_avg == 2.5  # all-time
    assert "(" in str(s)


def test_metric_logger():
    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    ml.update(loss=2.0)
    assert ml.loss.global_avg == 1.5
    assert "loss" in str(ml)


def test_monitor_roundtrip(tmp_path):
    mon = Monitor(str(tmp_path))
    mon.log_train(0, {"loss": 1.5})
    mon.log_train(1, {"loss": 1.2})
    mon.log_val(1, {"rmse": 9.0})
    logs = get_logs(mon.train_log)
    np.testing.assert_allclose(logs["loss"], [1.5, 1.2])
    mon.metrics.save_metrics()
    html = mon.metrics.plot_metrics()
    assert os.path.exists(html)
    text = open(html).read()
    assert "train_loss" in text and "<svg" in text

    m2 = Metrics(str(tmp_path))
    m2.load_metrics()
    assert m2.evolution["train_loss"][1] == 1.2


def test_vistool_draws(rng):
    vt = VisualUtil("dexycb")
    img = np.zeros((176, 176, 3), np.uint8)
    jt = rng.uniform(20, 150, size=(21, 3)).astype(np.float32)
    out = vt.plot(img, None, jt, jt + 3, return_image=True)
    assert out.shape == (176, 176, 3)
    assert out.sum() > 0  # something was drawn


def test_vis_minibatch_grid(rng):
    vt = VisualUtil("dexycb")
    depth = rng.uniform(0, 1, size=(5, 64, 64, 1)).astype(np.float32)
    jt = rng.uniform(5, 60, size=(5, 21, 3)).astype(np.float32)
    grid = vis_minibatch(None, depth, jt, vt)
    assert grid.shape == (2 * 64, 4 * 64, 3)
