"""jax.profiler trace hooks.

The reference has no profiler integration (SURVEY §5) — its only
introspection is the ptflops MAC count and the built-in throughput mode
(reference ``main.py:108-118``). On TPU the idiomatic tool is a profiler
trace viewable in XProf/TensorBoard, so the trainer exposes a window-based
hook: set ``PROFILE: /path/to/dir`` (or ``--profile DIR``) and steps
[start, start+count) of the first profiled epoch are captured.
"""

from __future__ import annotations

import jax

__all__ = ["StepProfiler"]


class StepProfiler:
    """Captures a jax.profiler trace over a window of training steps.

    Call :meth:`step` once per train step with the global step index; the
    trace starts at ``start`` and stops after ``count`` steps. No-op when
    ``log_dir`` is empty. :meth:`stop` is idempotent and safe to call at
    teardown (e.g. when training ends inside the window).
    """

    def __init__(self, log_dir: str, start: int = 10, count: int = 5):
        self.log_dir = log_dir
        self.start = start
        self.stop_at = start + count
        self._active = False
        self._done = False

    def step(self, global_step: int) -> None:
        if not self.log_dir or self._done:
            return
        if not self._active and self.start <= global_step < self.stop_at:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._active and global_step >= self.stop_at:
            self.stop()

    def stop(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
