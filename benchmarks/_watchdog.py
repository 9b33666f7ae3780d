"""Shared device watchdog for TPU benchmark scripts.

The axon TPU is reached over a relay; a lost grant leaves every device call
blocked forever with zero output (observed repeatedly across sessions — a
trivial `jnp.sum` probe hangs even from a fresh process). Call
``device_watchdog()`` before any timed work: it probes with a trivial
dispatch in a daemon thread and, if the probe does not complete in
``timeout_s`` (generous — a cold remote compile is 30-90 s), prints a
diagnostic line and exits nonzero so the run records WHY it produced no
number instead of hanging until an outer timeout kills it.

``bench.py`` keeps its own copy emitting its JSON-schema line; this helper
serves the `benchmarks/` scripts.
"""
import json
import os
import threading
import traceback


def device_watchdog(timeout_s: float = 600.0, label: str = 'benchmark'):
    done = threading.Event()
    failure = []

    def _probe():
        try:
            import jax.numpy as jnp
            float(jnp.sum(jnp.ones((8, 8)) @ jnp.ones((8, 8))))  # readback=sync
        except BaseException:
            failure.append(traceback.format_exc())
        finally:
            done.set()

    threading.Thread(target=_probe, daemon=True).start()
    if not done.wait(timeout_s) or failure:
        reason = (f'device error during trivial dispatch:\n{failure[0]}'
                  if failure else
                  f'device unreachable: trivial dispatch did not complete '
                  f'within {timeout_s:.0f}s (tunnel/grant wedged?)')
        print(json.dumps({'benchmark': label, 'error': reason}), flush=True)
        os._exit(3)
