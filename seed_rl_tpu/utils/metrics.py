"""Metrics logging: TensorBoard scalars + console progress.

Replaces the reference's ``ProgressLogger`` background thread +
``LoggingTape`` (common/utils.py:546-677, modules/logging_module.py): in the
JAX design, jitted steps *return* a flat ``{name: scalar}`` dict, and this
module writes it out on the host at the logging cadence — including the
``speed/steps_per_sec`` throughput metric the reference reports
(utils.py:661).
"""

import time
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, logdir: Optional[str] = None, console_every_secs: float = 30.0):
        self._writer = None
        if logdir:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(logdir)
        self._console_every = console_every_secs
        self._last_console = 0.0
        self._last_speed_time = None
        self._last_speed_frames = 0

    def log(self, step: int, metrics: Dict[str, float], frames: Optional[int] = None):
        metrics = {k: float(np.asarray(v)) for k, v in metrics.items()}
        if frames is not None:
            now = time.time()
            if self._last_speed_time is not None:
                dt = now - self._last_speed_time
                if dt > 0:
                    metrics["speed/env_frames_per_sec"] = (
                        frames - self._last_speed_frames
                    ) / dt
            self._last_speed_time = now
            self._last_speed_frames = frames

        if self._writer is not None:
            for key, value in metrics.items():
                self._writer.add_scalar(key, value, step)

        now = time.time()
        if now - self._last_console >= self._console_every:
            self._last_console = now
            parts = [f"step={step}"]
            if frames is not None:
                parts.append(f"frames={frames}")
            for key in sorted(metrics):
                parts.append(f"{key}={metrics[key]:.4g}")
            print("[seed_rl_tpu] " + " ".join(parts), flush=True)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
