"""CI scale knob for the example scripts.

``COLLIE_TPU_SMOKE=1`` shrinks every example to a seconds-long configuration
(1 epoch, per-user-capped data, small catalogs) so ``tests/test_examples.py``
can execute each script end-to-end on the forced-CPU platform — the round-1
review found a bug only the examples exercised (a stale-stage compiled-eval
cache hit in ``examples/06_cold_start.py``).  Unset (the default), examples
run their full documented configurations.
"""
import os

SMOKE = os.environ.get('COLLIE_TPU_SMOKE', '0').lower() not in ('0', '', 'false')

if SMOKE:
    # honor the caller's platform choice even under the ambient TPU plugin,
    # whose sitecustomize overrides a plain JAX_PLATFORMS env var at
    # interpreter start (same dance as __graft_entry__.dryrun_multichip)
    _platform = os.environ.get('JAX_PLATFORMS')
    if _platform:
        import jax

        jax.config.update('jax_platforms', _platform)


def epochs(n: int) -> int:
    """Full-run epoch count, or 1 under ``COLLIE_TPU_SMOKE``."""
    return 1 if SMOKE else n


def scaled(full, smoke):
    """Pick a config value by mode."""
    return smoke if SMOKE else full


def cap_interactions_df(df, per_user: int = 20):
    """Cap interactions per user under smoke mode.

    Keeps every user (so stratified splits stay valid) and the original id
    space; only the row count shrinks.
    """
    if not SMOKE:
        return df
    return (df.groupby('user_id', group_keys=False).head(per_user)
              .reset_index(drop=True))
