"""Utility-layer tests: checkify debug wrapper, metric writer, meters,
profiling timer, schedules."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cnsn_tpu.train import cosine_lr, imagenet_step_lr, poly_lr, step_lr
from cnsn_tpu.utils import AverageMeter, get_log_dir_path
from cnsn_tpu.utils.debug import checked
from cnsn_tpu.utils.metrics_io import MetricWriter
from cnsn_tpu.utils.profiling import StepTimer


def test_checked_raises_on_nan():
    f = checked(lambda x: {"loss": jnp.log(x)})
    assert np.isclose(float(f(jnp.asarray(2.0))["loss"]), np.log(2.0))
    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.scalar("loss", 1.5, 3)
    w.scalar("acc", 0.9, 4)
    w.close()
    lines = [json.loads(l) for l in open(w.path)]
    assert lines[0] == {**lines[0], "tag": "loss", "value": 1.5, "step": 3}
    assert lines[1]["tag"] == "acc"


def test_metric_writer_tensorboard_mirror(tmp_path):
    """tensorboard=True mirrors scalars into TB event files readable by
    the standard loader (reference tensorboardX workflow,
    train_cnsn.py:372-376) while keeping the JSONL stream."""
    # the module MetricWriter actually imports (an image can carry
    # tensorboard but not torch, and vice versa)
    pytest.importorskip("torch.utils.tensorboard")
    w = MetricWriter(str(tmp_path), tensorboard=True)
    w.scalar("mIoU_val", 0.42, 7)
    w.close()
    events = [f for f in os.listdir(tmp_path)
              if f.startswith("events.out.tfevents")]
    assert events, os.listdir(tmp_path)
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    [ev] = acc.Scalars("mIoU_val")
    assert ev.step == 7 and abs(ev.value - 0.42) < 1e-6
    assert json.loads(open(w.path).readline())["tag"] == "mIoU_val"


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, 2)
    m.update(4.0, 1)
    assert m.val == 4.0 and m.count == 3
    np.testing.assert_allclose(m.avg, 2.0)


def test_log_dir_layout():
    p = get_log_dir_path("/tmp/exp", "run")
    parts = p.split(os.sep)
    assert parts[-2].count("_") == 2  # date stamp
    assert parts[-1].startswith("run_")


def test_step_timer():
    t = StepTimer()
    t.data_loaded()
    t.step_done()
    assert "Data" in t.summary() and "Batch" in t.summary()


def test_schedule_shapes():
    # imagenet step: /10 at epochs//3 boundaries, batch-scaled
    s = imagenet_step_lr(0.1, 90, 512, steps_per_epoch=10)
    np.testing.assert_allclose(float(s(0)), 0.1 * 2.0)
    np.testing.assert_allclose(float(s(30 * 10)), 0.01 * 2.0)
    np.testing.assert_allclose(float(s(60 * 10)), 0.001 * 2.0, rtol=1e-6)
    # tail is capped at 0.01x — a 3-level staircase (imagenet.py:92-104:
    # m = 1 / 0.1 / 0.01), epochs past 3k do NOT decay further
    np.testing.assert_allclose(float(s(89 * 10)), 0.001 * 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(s(95 * 10)), 0.001 * 2.0, rtol=1e-6)
    # poly — the reference assigns poly(i+1) AFTER optimizer.step()
    # (train_cnsn.py:319-349), so 0-based update s runs at poly(s): the
    # first update uses base_lr and no update ever runs at lr=0
    p = poly_lr(0.01, 100)
    np.testing.assert_allclose(float(p(0)), 0.01)
    np.testing.assert_allclose(float(p(99)), 0.01 * (1 - 99 / 100) ** 0.9,
                               rtol=1e-6)
    # seg step
    st = step_lr(0.1, 25, 100)
    np.testing.assert_allclose(float(st(2499 * 100 // 100)), 0.1 * 0.1 ** (24 // 25))


class TestDevicePrefetch:
    def test_yields_transformed_in_order(self):
        from cnsn_tpu.utils.prefetch import device_prefetch
        items = [(np.full((2, 2), i), np.array([i])) for i in range(7)]
        out = list(device_prefetch(iter(items), lambda b: (b[0] * 2, b[1]),
                                   depth=2))
        assert len(out) == 7
        for i, (a, b) in enumerate(out):
            np.testing.assert_array_equal(a, np.full((2, 2), i) * 2)
            assert b[0] == i

    def test_depth_zero_inline(self):
        from cnsn_tpu.utils.prefetch import device_prefetch
        out = list(device_prefetch(iter([1, 2, 3]), lambda x: x + 1, depth=0))
        assert out == [2, 3, 4]

    def test_worker_exception_propagates(self):
        import pytest
        from cnsn_tpu.utils.prefetch import device_prefetch

        def bad():
            yield 1
            raise RuntimeError("loader died")

        it = device_prefetch(bad(), lambda x: x, depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="loader died"):
            list(it)

    def test_abandoned_generator_releases_worker(self):
        import threading
        import time
        from cnsn_tpu.utils.prefetch import device_prefetch

        n_before = threading.active_count()
        it = device_prefetch(iter(range(100)), lambda x: x, depth=2)
        assert next(it) == 0
        it.close()  # abandon mid-stream
        for _ in range(50):  # worker should exit promptly
            if threading.active_count() <= n_before:
                break
            time.sleep(0.1)
        assert threading.active_count() <= n_before


def test_provenance_snapshot(tmp_path, capsys):
    """Exp-dir provenance (reference train_cnsn.sh: cp driver+config,
    tee log): config.yaml + code zip + optional stdout tee."""
    import io
    import sys
    import zipfile

    from cnsn_tpu.config import ExperimentConfig
    from cnsn_tpu.utils.provenance import TeeLog, snapshot_experiment

    out = snapshot_experiment(str(tmp_path), ExperimentConfig(lr=0.42),
                              tee=False)
    assert out["config"] and os.path.exists(out["config"])
    import yaml
    assert yaml.safe_load(open(out["config"]))["lr"] == 0.42
    with zipfile.ZipFile(out["code"]) as z:
        names = z.namelist()
    assert any(n.endswith("cnsn_tpu/nn/cnsn.py") for n in names)
    assert any(n.endswith("cnsn_tpu/utils/provenance.py") for n in names)

    buf, log = io.StringIO(), str(tmp_path / "t.log")
    tee = TeeLog(buf, log)
    tee.write("hello\n")
    tee.flush()
    assert buf.getvalue() == "hello\n"
    assert open(log).read() == "hello\n"
