"""Test configuration: run the suite on an 8-virtual-device CPU platform.

Multi-chip hardware is not available in CI; sharding tests validate the
multi-chip path on a virtual CPU mesh (the driver separately dry-run-compiles
``__graft_entry__.dryrun_multichip``).  Env vars must be set before jax is
imported anywhere.
"""
import os

# force-override: the ambient environment may pin JAX_PLATFORMS to the TPU
os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

# some pytest plugins (jaxtyping) import jax before this conftest runs, which
# freezes the platform choice from the ambient env; override via config too
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(42)
