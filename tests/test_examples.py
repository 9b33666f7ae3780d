"""Every example script runs end-to-end at smoke scale.

The round-1 review found a bug that only the examples exercised (a stale
stage in the fused-eval compiled-fn cache, hit by ``examples/06``'s final
evaluation) — this matrix keeps every documented entry point executable.
``COLLIE_TPU_SMOKE=1`` shrinks each script to a seconds-long configuration
(see ``examples/_scale.py``); each runs in a fresh interpreter on the
forced-CPU 8-virtual-device platform, mirroring ``conftest.py``.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted((Path(__file__).parent.parent / 'examples').glob('[0-9]*.py'))
assert EXAMPLES, 'no example scripts found — did examples/ move?'


def _smoke_env():
    env = dict(os.environ)
    env['COLLIE_TPU_SMOKE'] = '1'
    env['COLLIE_TPU_SYNTHETIC_MOVIELENS'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    flags = env.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=8').strip()
    return env


@pytest.mark.parametrize('script', EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(script):
    proc = subprocess.run([sys.executable, str(script)], capture_output=True,
                          text=True, timeout=600, env=_smoke_env())
    assert proc.returncode == 0, (
        f'{script.name} failed (rc={proc.returncode})\n'
        f'--- stdout ---\n{proc.stdout[-3000:]}\n'
        f'--- stderr ---\n{proc.stderr[-3000:]}')
