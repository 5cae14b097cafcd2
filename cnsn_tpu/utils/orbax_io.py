"""Orbax-backed checkpointing: async saves, keep-N retention, restore.

Optional trainer backend (``ckpt_backend: orbax``) next to the msgpack
checkpointer (utils/checkpoint.py) for long ImageNet/segmentation runs
— async saves overlap with the next train steps, and a SIGTERM hook
flushes a final checkpoint before preemption (the failure-recovery
behavior SURVEY §5 plans for; the reference only has resume-on-restart,
cifar.py:415-430, segmentation/tool/train_cnsn.py:191-204).
"""
from __future__ import annotations

import signal
import threading
from typing import Callable, Optional

__all__ = ["OrbaxCheckpointer", "install_preemption_save"]


class OrbaxCheckpointer:
    """Wraps an orbax CheckpointManager around a TrainState.

    ``save``/``restore`` move {params, batch_stats, opt_state, step}
    plus a free-form ``extra`` dict (epoch, best_acc, ...) that the
    host loop owns.  Saves are async by default (overlap the next train
    steps); retention keeps the newest ``keep`` steps.
    """

    def __init__(self, directory: str, keep: int = 2,
                 save_interval_steps: int = 1):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True))

    def _payload(self, state, extra: Optional[dict]):
        return {"params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": state.step,
                "extra": dict(extra or {})}

    def save(self, step: int, state, extra: Optional[dict] = None,
             metrics: Optional[dict] = None, wait: bool = False):
        self.manager.save(
            step, args=self._ocp.args.StandardSave(
                self._payload(state, extra)),
            metrics=metrics)
        if wait:
            self.manager.wait_until_finished()

    def restore(self, state, step: Optional[int] = None,
                extra_template: Optional[dict] = None):
        """Returns (state, step, extra); (state, None, {}) when the
        directory has no checkpoint yet."""
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return state, None, {}
        template = self._payload(state, extra_template)
        payload = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template))
        extra = payload.pop("extra", {})
        return state.replace(**payload), step, extra

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


def install_preemption_save(get_state: Callable,
                            checkpointer: OrbaxCheckpointer,
                            get_extra: Optional[Callable] = None,
                            exit_code: Optional[int] = None):
    """SIGTERM → synchronous final save (then optional process exit).

    ``get_state`` returns (step, state) at signal time; ``get_extra``
    (optional) returns the host-loop extras dict.  With ``exit_code``
    the handler ends the process after the flush — the preemption
    contract (SLURM/GKE send SIGTERM, then SIGKILL after a grace
    period), so the run must not resume training on a half-epoch.
    """
    done = threading.Event()

    def handler(signum, frame):
        if done.is_set():
            return
        done.set()
        step, state = get_state()
        extra = get_extra() if get_extra is not None else None
        checkpointer.save(int(step), state, extra=extra, wait=True)
        if exit_code is not None:
            import os
            os._exit(exit_code)

    prev = signal.signal(signal.SIGTERM, handler)
    return prev
