"""Test configuration: run the suite on an 8-virtual-device CPU platform.

Multi-chip hardware is not available in CI; sharding tests validate the
multi-chip path on a virtual CPU mesh (the driver separately dry-run-compiles
``__graft_entry__.dryrun_multichip``).  Env vars must be set before jax is
imported anywhere.

Expected skips in a full run (3): the ``n_meta == 0`` parametrizations of
``test_reference_loss_parity.py::test_ideal_difference_matches_reference`` —
``ideal_difference_from_metadata`` is only defined over metadata, so the
no-metadata cells of the shared CASES grid are skipped by construction (the
same cells DO run for the loss functions, where no-metadata is meaningful).
Two further conditional skips never fire in this environment: the reference
checkout exists at ``/root/reference`` (reference-parity tests), and the
conftest guarantees the 8-virtual-device mesh (bf16 sharding tests).
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
