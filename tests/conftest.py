"""Test configuration: run the suite on an 8-virtual-device CPU platform.

Multi-chip hardware is not available in CI; sharding tests validate the
multi-chip path on a virtual CPU mesh (the driver separately dry-run-compiles
``__graft_entry__.dryrun_multichip``).  Env vars must be set before jax is
imported anywhere.
"""
import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(42)
