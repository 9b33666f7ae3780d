"""Global configuration for ``collie_tpu``.

Mirrors the reference's single environment-driven config knob
(``/root/reference/collie/config.py:5``): ``DATA_PATH`` points at the directory
where datasets (e.g. MovieLens 100K) are cached on the host.
"""
import os
from pathlib import Path

DATA_PATH = Path(os.environ.get('DATA_PATH', 'data'))
