"""Progress reporting + pass tracing.

Re-design of the reference's progress plumbing (utils.progressbars,
misc/progressbar.py, executor signals) and the tracing gap noted in SURVEY §5:
every pass records wall time, rows, tiles and the task list in
``executor.trace_log`` (ring buffer), and ``progress=`` arguments accept
True/'simple' (stderr bar), a callable (return False to cancel — the
reference's cancellation pathway, execution.py:253-258), or None.
"""

from __future__ import annotations

import sys
import time


class ProgressBar:
    def __init__(self, title="vaex_tpu", out=sys.stderr, width=40):
        self.title = title
        self.out = out
        self.width = width
        self.start = time.time()
        self.last = 0.0

    def __call__(self, fraction):
        now = time.time()
        if fraction < 1.0 and now - self.last < 0.05:
            return True
        self.last = now
        filled = int(self.width * min(fraction, 1.0))
        bar = "#" * filled + "-" * (self.width - filled)
        elapsed = now - self.start
        eta = elapsed / fraction * (1 - fraction) if fraction > 0 else 0
        self.out.write(f"\r{self.title} [{bar}] {fraction*100:6.2f}% "
                       f"elapsed {elapsed:6.2f}s eta {eta:6.2f}s")
        if fraction >= 1.0:
            self.out.write("\n")
        self.out.flush()
        return True


def bar(progress, title="vaex_tpu"):
    """Normalize a progress= argument to a callable or None."""
    if progress is None or progress is False:
        return None
    if progress is True or progress == "simple":
        return ProgressBar(title)
    if callable(progress):
        return progress
    return None


class scoped_progress:
    """Context manager temporarily connecting a callback to an executor."""

    def __init__(self, executor, progress, title="vaex_tpu"):
        self.executor = executor
        self.callback = bar(progress, title)

    def __enter__(self):
        if self.callback is not None:
            self.executor.signal_progress.connect(self.callback)
        return self.callback

    def __exit__(self, *exc):
        if self.callback is not None:
            try:
                self.executor.signal_progress.disconnect(self.callback)
            except ValueError:
                pass
        return False
