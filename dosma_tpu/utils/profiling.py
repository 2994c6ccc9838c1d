"""Tracing / profiling utilities.

The reference has no profiler — only tqdm progress bars and a CLI elapsed
log (SURVEY.md §5). The TPU build exposes:

- :func:`trace`: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace,
- :class:`StageTimer`: lightweight named per-stage wall timers threaded
  through pipelines (the ``verbose``/elapsed-time surface of the CLI),
- :func:`annotate`: op-level named region (shows up in device traces).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

__all__ = ["trace", "annotate", "StageTimer"]

_logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf.

    Example::

        with profiling.trace("/tmp/trace"):
            fitter.fit(x, y)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for device traces (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Named wall-clock stage timers with a printable report.

    Example::

        timer = StageTimer(verbose=True)
        with timer("load"):
            vols = dm.read(path)
        with timer("fit"):
            fitter.fit(x, vols)
        print(timer.report())
    """

    def __init__(self, verbose: bool = False, logger: Optional[logging.Logger] = None):
        self.verbose = verbose
        self._logger = logger or _logger
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self.verbose:
                self._logger.info(f"[{name}] {dt:.3f}s")

    def report(self) -> str:
        if not self.times:
            return "(no stages timed)"
        width = max(len(k) for k in self.times)
        total = sum(self.times.values())
        lines = [f"{k.ljust(width)}  {v:8.3f}s" for k, v in self.times.items()]
        lines.append(f"{'total'.ljust(width)}  {total:8.3f}s")
        return "\n".join(lines)
