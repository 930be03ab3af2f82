"""Wall-clock profiling helpers.

Parity with /root/reference/common/profiling.py and the PPO inference-stage
profiling switch (agents/policy_gradient/learner_config.py:24-29,
learner.py:952-1073):

- ``ExportingTimer``: a context manager accumulating wall-clock durations
  and exporting a windowed average every ``aggregation_window_size`` uses
  (reference profiling.py:42-76 exports to tf.summary; here the export goes
  to a callback / is readable via ``last_average`` so any logger can pick
  it up).
- ``InferenceReturn``: stage-isolating early-return points for the external
  actor inference path. Setting ``InferenceBridge.profile_inference_return``
  makes the handler return a zero action at the chosen stage, so the cost
  of each stage (batching only / + state gather / + policy / + unroll
  store) can be measured by differencing throughputs — exactly the
  reference's ``--profile_inference_return`` methodology.

For device-side (jitted) code, use ``jax.profiler`` traces; stages inside
one fused program are visible in the trace viewer instead.
"""

import enum
import time
from typing import Callable, Optional


class InferenceReturn(enum.Enum):
    """Early-return stages (reference learner_config.py:24-29)."""

    INSTANTLY = 1  # measures request batching/dispatch only
    BEFORE_INFERENCE = 2  # + run_id bookkeeping and state gather
    AFTER_INFERENCE = 3  # + the jitted policy step
    AFTER_UNROLL = 4  # + unroll-store append
    END = 5  # full handler (no early return)


class ExportingTimer:
    """``with timer:`` accumulator exporting windowed wall-clock averages.

    Reference semantics (profiling.py:42-76): every
    ``aggregation_window_size`` measurements, export the window's average
    and restart the window.
    """

    def __init__(
        self,
        name: str,
        aggregation_window_size: int = 100,
        export_fn: Optional[Callable[[str, float], None]] = None,
    ):
        self.name = name
        self.window = aggregation_window_size
        self.export_fn = export_fn
        self.last_average: Optional[float] = None
        self._sum = 0.0
        self._count = 0
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._sum += time.perf_counter() - self._t0
        self._count += 1
        if self._count >= self.window:
            self.last_average = self._sum / self._count
            if self.export_fn is not None:
                self.export_fn(self.name, self.last_average)
            self._sum = 0.0
            self._count = 0
        return False
