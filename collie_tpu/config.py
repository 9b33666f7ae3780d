"""Global configuration for ``collie_tpu``.

Mirrors the reference's single environment-driven config knob
(``/root/reference/collie/config.py:5``): ``DATA_PATH`` points at the directory
where datasets (e.g. MovieLens 100K) are cached on the host.
"""
import os
from pathlib import Path

DATA_PATH = Path(os.environ.get('DATA_PATH', 'data'))

_cache_configured = False


def enable_compilation_cache() -> None:
    """Point jax at a persistent compilation cache (idempotent).

    Cold-start compiles dominate short jobs — especially on remote/tunneled
    TPUs where compilation is an RPC — and the whole-epoch scan programs are
    identical across processes for a given config, so a disk cache removes
    them entirely on re-runs.  Called from the jax-importing modules
    (models/trainer); opt out with ``COLLIE_TPU_NO_COMPILATION_CACHE=1`` or
    redirect with ``COLLIE_TPU_COMPILATION_CACHE=<dir>``.
    """
    global _cache_configured
    if _cache_configured or os.environ.get('COLLIE_TPU_NO_COMPILATION_CACHE'):
        return
    _cache_configured = True
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache_dir = os.environ.get(
                'COLLIE_TPU_COMPILATION_CACHE',
                os.path.join(os.path.expanduser('~'), '.cache', 'collie_tpu', 'jax'))
            Path(cache_dir).mkdir(parents=True, exist_ok=True)
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # cache is an optimization; never break import
        pass
