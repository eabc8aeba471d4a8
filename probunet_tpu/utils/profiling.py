"""Tracing / profiling hooks.

The reference's only observability is tqdm postfix text
(reference src/train_prob_unet_model.py:118-150 — SURVEY.md §5). Here:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  Perfetto/XPlane trace directory viewable in TensorBoard or ui.perfetto.dev;
- :class:`Throughput` — steps/sec + samples(px)/sec counters with warmup
  exclusion (the BASELINE.json metric definitions);
- :func:`nan_check_mode` — enables ``jax_debug_nans`` (the sanitizer analog
  for a single-program SPMD runtime: re-runs the offending primitive
  un-jitted and raises at the first NaN).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture a device+host profile of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_check_mode(enable: bool = True):
    """Run the enclosed block with jax_debug_nans (SURVEY.md §5: the
    race-detector analog — the reference has no sanitizers at all)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def device_sync(x) -> float:
    """TRUE device synchronization: a scalar host read that depends on x.

    On remote-attached backends (the axon tunnel) ``jax.block_until_ready``
    returns when the local proxy buffer is enqueued, NOT when the remote
    compute finishes — timings synchronized with it can read up to ~300x
    too fast. Call this on a value produced by the work being timed (the
    dependency forces the whole chain to complete before the read returns).
    """
    import jax.numpy as jnp

    return float(jax.device_get(jnp.ravel(x)[0]))


class Throughput:
    """Steps/sec and samples/sec counter with warmup exclusion.

    NOTE: on async backends BOTH ends of the window need a true device sync
    (:func:`device_sync`; ``block_until_ready`` is not one on the axon
    tunnel). Without them the warmup tail (including compile) leaks into the
    measured window and the end may cover only dispatch. The honest pattern:

    >>> tp = Throughput(batch_size=32)
    >>> out = step(...); device_sync(out)     # warmup + compile, drained
    >>> tp.start()                            # timer starts at a quiesced device
    >>> for batch in batches: out = step(...); tp.step()
    >>> device_sync(out); tp.summary()

    The legacy mode (no ``start()``; the timer auto-starts at the
    ``step()`` where count reaches ``warmup_steps``) remains, but measures
    from host dispatch time of that step, not device completion.
    """

    def __init__(self, batch_size: int, warmup_steps: int = 2,
                 pixels_per_sample: int | None = None):
        self.batch_size = batch_size
        self.warmup_steps = warmup_steps
        self.pixels_per_sample = pixels_per_sample
        self.count = 0
        self._t0 = None

    def start(self):
        """Start the measured window NOW (call right after a device_sync on
        the last warmup step's output). Steps counted so far become warmup."""
        self._t0 = time.perf_counter()
        self._measured_from = self.count

    def step(self, n: int = 1):
        self.count += n
        if self._t0 is None and self.count >= self.warmup_steps:
            self._t0 = time.perf_counter()
            self._measured_from = self.count

    def summary(self) -> dict[str, float]:
        if self._t0 is None or self.count <= self._measured_from:
            return {"steps_per_sec": 0.0, "samples_per_sec": 0.0}
        dt = time.perf_counter() - self._t0
        steps = self.count - self._measured_from
        out = {
            "steps_per_sec": steps / dt,
            "samples_per_sec": steps * self.batch_size / dt,
        }
        if self.pixels_per_sample:
            out["pixels_per_sec"] = out["samples_per_sec"] * self.pixels_per_sample
        return out
