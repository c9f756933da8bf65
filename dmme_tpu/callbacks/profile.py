"""ProfileTrace callback — capture a device trace for a window of steps.

The reference's only profiling surface is Lightning's ``profiler: null``
slot (SURVEY.md §5). Here profiling is a first-class callback: attach

.. code-block:: yaml

    trainer:
      callbacks:
        - class_path: dmme_tpu.callbacks.ProfileTrace
          init_args: {start_step: 10, num_steps: 5, log_dir: runs/profile}

and steps [start_step, start_step + num_steps) are captured with
``jax.profiler`` into a TensorBoard-loadable xplane trace. The window
starts after warm-up steps so the trace shows steady-state fusions, not
compilation. A full device sync runs before start and stop so the window
boundaries are exact even under the async dispatch / chunked modes.
"""

from __future__ import annotations

import jax

from dmme_tpu.utils.profiling import sync


class ProfileTrace:
    """Trace steps [start_step, start_step + num_steps) into ``log_dir``."""

    def __init__(self, start_step: int = 10, num_steps: int = 5,
                 log_dir: str = "profile"):
        self.start_step = start_step
        self.num_steps = num_steps
        self.log_dir = log_dir
        self._started = False
        self._stopped = False

    def on_fit_start(self, lit, state, logger=None) -> None:
        if self.start_step <= 0 and not self._started:
            # a window anchored at step 0 can only open before any step runs
            jax.profiler.start_trace(self.log_dir)
            self._started = True

    def on_train_step_end(self, step: int, lit, state, logger=None,
                          stride: int = 1) -> None:
        """``stride`` = steps executed per hook firing (``steps_per_call``).
        With stride > 1 the window snaps to chunk boundaries: it opens at
        the last hook firing before ``start_step`` (so up to ``stride - 1``
        earlier steps land in the trace) and closes at the first firing at
        or past the window end — the granularity is one chunk."""
        if self._stopped:
            return
        # This hook fires *after* steps (step - stride, step] execute, so to
        # capture steps [start_step, start_step + num_steps) the trace must
        # open at the last firing with step < start_step and close at the
        # end of the window's last chunk.
        if not self._started and step >= self.start_step - stride:
            sync(state.params)  # drain pending work: trace only the window
            jax.profiler.start_trace(self.log_dir)
            self._started = True
            return
        if self._started and step >= self.start_step + self.num_steps - 1:
            self._stop(state)

    def on_fit_end(self, lit, state, logger=None) -> None:
        if self._started and not self._stopped:  # short runs: close the trace
            self._stop(state)

    def _stop(self, state) -> None:
        sync(state.params)
        jax.profiler.stop_trace()
        self._stopped = True
        print(f"[profile] trace written to {self.log_dir}")
