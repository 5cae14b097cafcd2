"""Orbax-backed checkpointing: async saves, keep-N retention, restore.

Optional alternative to the msgpack checkpointer (utils/checkpoint.py)
for long ImageNet/segmentation runs — async saves overlap with the next
train steps, and a SIGTERM hook flushes a final checkpoint before
preemption (the failure-recovery behavior SURVEY §5 plans for; the
reference only has resume-on-restart).
"""
from __future__ import annotations

import signal
import threading
from typing import Optional

__all__ = ["OrbaxCheckpointer", "install_preemption_save"]


class OrbaxCheckpointer:
    def __init__(self, directory: str, keep: int = 2,
                 save_interval_steps: int = 1):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.manager = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=save_interval_steps,
                enable_async_checkpointing=True))

    def save(self, step: int, state, metrics: Optional[dict] = None,
             wait: bool = False):
        payload = {"params": state.params,
                   "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state,
                   "step": state.step}
        self.manager.save(step, args=self._ocp.args.StandardSave(payload),
                          metrics=metrics)
        if wait:
            self.manager.wait_until_finished()

    def restore(self, state, step: Optional[int] = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return state, None
        template = {"params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": state.step}
        payload = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template))
        return state.replace(**payload), step

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


def install_preemption_save(get_state, checkpointer: OrbaxCheckpointer):
    """SIGTERM → synchronous final save.  ``get_state`` returns
    (step, state) at signal time."""
    done = threading.Event()

    def handler(signum, frame):
        if done.is_set():
            return
        done.set()
        step, state = get_state()
        checkpointer.save(int(step), state, wait=True)

    prev = signal.signal(signal.SIGTERM, handler)
    return prev
