"""Profiling and tracing utilities.

The reference's observability is tqdm progress bars plus a wall-clock section
timer (``/root/reference/collie/model/base/trainer.py:339-344``,
``utils.py:411-431``).  The TPU rebuild's superset (SURVEY §5.1):

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace (XLA op timeline, HBM usage) for any
  training / evaluation region;
* ``annotate(name)`` — names a host-side region so it shows up in the trace
  (``jax.profiler.TraceAnnotation``);
* ``EpochTimer`` — lightweight per-epoch wall-clock + examples/sec collector
  usable as a trainer logger.
"""
import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace into ``logdir`` (view with TensorBoard)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Name a host region inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Optional[Dict[str, int]]:
    """Live per-device memory statistics, when the backend exposes them."""
    device = jax.devices()[0]
    stats = getattr(device, 'memory_stats', None)
    return stats() if callable(stats) else None


class EpochTimer:
    """Trainer-compatible logger collecting per-epoch losses and timings.

    Usage::

        timer = EpochTimer()
        trainer = CollieTrainer(model, logger=timer, ...)
        trainer.fit(model)
        print(timer.summary())
    """

    def __init__(self):
        self.epoch_losses: List[float] = []
        self.val_losses: List[float] = []
        self._epoch_times: List[float] = []
        self._last = time.perf_counter()

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        now = time.perf_counter()
        if 'train_loss_epoch' in metrics:
            self.epoch_losses.append(metrics['train_loss_epoch'])
            self._epoch_times.append(now - self._last)
            self._last = now
        if 'val_loss_epoch' in metrics:
            self.val_losses.append(metrics['val_loss_epoch'])

    def summary(self) -> Dict[str, float]:
        if not self._epoch_times:
            return {}
        return {
            'epochs': len(self.epoch_losses),
            'mean_epoch_seconds': sum(self._epoch_times) / len(self._epoch_times),
            'final_train_loss': self.epoch_losses[-1],
            'final_val_loss': self.val_losses[-1] if self.val_losses else None,
        }
