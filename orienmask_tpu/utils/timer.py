"""Module-global timing registry (reference utils/timer.py).

CUDA events become ``jax.block_until_ready`` bracketing: a label's timer optionally
holds device arrays to synchronize on before reading the wall clock, so compiled
TPU work is measured accurately without a device round-trip per op.  Label set is
kept identical to the reference (``Network Forward`` / ``Postprocess`` / ...) so FPS
reports are comparable.
"""

import time
from collections import OrderedDict

import jax
import numpy as np

_timer_history = OrderedDict()
_sync = True


def cuda():  # name kept for API parity; enables device sync
    global _sync
    _sync = True


def cpu():
    global _sync
    _sync = False


def reset():
    _timer_history.clear()


def get_all_elapsed_time():
    return {k: float(np.mean(v)) for k, v in _timer_history.items()}


def log_elapsed_time(logger=None):
    lines = ["Item\tTime (ms)\tFPS"]
    for k, v in get_all_elapsed_time().items():
        lines.append(f"{k}\t{v:.2f}\t{1000 / v:.2f}")
    msg = "\n".join(lines)
    (logger.info if logger else print)(msg)


class timer:
    """``with timer.timer('stage'): ...`` context manager; call ``t.sync(x)``
    inside the block to register device values to block on at exit."""

    def __init__(self, name):
        self.name = name
        self._sync_targets = []

    def sync(self, value):
        self._sync_targets.append(value)
        return value

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if _sync and self._sync_targets:
            jax.block_until_ready(self._sync_targets)
        elapsed_ms = (time.perf_counter() - self.start) * 1000
        _timer_history.setdefault(self.name, []).append(elapsed_ms)
