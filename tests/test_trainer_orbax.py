"""Orbax trainer backend: preemption (SIGTERM) save + resume.

Integration test for the failure-detection subsystem (SURVEY §5): a
real training process is killed mid-epoch with SIGTERM; the installed
preemption handler must flush an orbax checkpoint and exit 143; a
second process pointed at the same experiment dir must auto-restore
that exact optimizer step and continue.  (Reference only has
resume-on-restart: cifar.py:415-430.)

This file doubles as the child driver:
``python tests/test_trainer_orbax.py train <exp_dir>`` trains until
killed; ``... resume <exp_dir>`` restores and prints a JSON line.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow


def _spawn(mode, exp_dir):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), mode, exp_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env)


def test_preemption_save_and_resume(tmp_path):
    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir)

    p = _spawn("train", exp_dir)
    # wait until real steps are flowing, then preempt mid-epoch
    saw = 0
    t0 = time.time()
    for line in p.stdout:
        if "Train Loss" in line:
            saw += 1
            if saw >= 2:
                break
        assert time.time() - t0 < 600, "training never started"
    p.send_signal(signal.SIGTERM)
    out = p.stdout.read()
    rc = p.wait(timeout=600)
    assert rc == 143, (rc, out[-2000:])

    r = _spawn("resume", exp_dir)
    out, _ = r.communicate(timeout=900)
    assert r.returncode == 0, out[-2000:]
    line = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    # the flushed step was mid-epoch-0: restore must see it
    assert rec["restored_step"] >= 1
    assert rec["start_epoch"] == 0
    assert rec["state_step"] == rec["restored_step"]
    assert rec["step_after_one"] == rec["restored_step"] + 1


# ---------------------------------------------------------------------------
# subprocess driver
# ---------------------------------------------------------------------------

def _make_trainer(exp_dir):
    import jax
    jax.config.update("jax_platforms", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    from cnsn_tpu.config import ExperimentConfig
    from cnsn_tpu.train.trainer import Trainer
    cfg = ExperimentConfig(
        dataset="cifar10", model="allconv", cnsn_type="cn", pos=1,
        crop="neither", beta=1.0, cn_prob=0.5, active_num=1,
        synthetic_data=True, batch_size=16, eval_batch_size=64,
        epochs=500, print_freq=1, num_devices=1, workers=0,
        ckpt_backend="orbax", exp_dir=exp_dir, resume=exp_dir, seed=3)
    return Trainer(cfg)


def _driver(mode, exp_dir):
    tr = _make_trainer(exp_dir)
    if mode == "train":
        tr.fit()  # runs until SIGTERM; the handler exits 143
        return
    # resume: report what was restored, then prove training continues
    import jax
    restored = int(jax.device_get(tr.state.step))
    latest = tr.ckpt.manager.latest_step()
    batch = next(iter(tr.train_loader))
    im, lb = tr.dp.shard_inputs(jax.numpy.asarray(batch[0]),
                                jax.numpy.asarray(batch[1]))
    state2, _ = tr.steps.plain(tr.state, im, lb, jax.random.key(0))
    print(json.dumps({"restored_step": int(latest or 0),
                      "state_step": restored,
                      "start_epoch": tr.start_epoch,
                      "step_after_one": int(jax.device_get(state2.step))}))


if __name__ == "__main__":
    _driver(sys.argv[1], sys.argv[2])
