"""collie_tpu — a TPU-native deep-learning recommender framework.

A from-scratch JAX/XLA/Pallas rebuild with the full capability surface of the
reference library (ShopRunner/collie 1.3.1): implicit/explicit interaction
datasets with vectorized negative sampling, pairwise ranking losses with
partial-credit metadata, an embedding-factorization model zoo, jit-compiled
training with multi-optimizer / multi-stage schedules, full-catalog ranking
evaluation, and mesh-sharded multi-chip execution.

Everything is re-exported flat from this module, matching the reference's
star-import surface (``/root/reference/collie/__init__.py:1-10``).
"""
from collie_tpu._version import __version__

from collie_tpu.config import DATA_PATH
from collie_tpu.data import (ApproximateNegativeSamplingInteractionsDataLoader,
                             BaseInteractions,
                             BaseInteractionsDataLoader,
                             ExplicitInteractions,
                             HDF5Interactions,
                             HDF5InteractionsDataLoader,
                             Interactions,
                             InteractionsDataLoader,
                             NegativeSampler,
                             random_split,
                             stratified_split)
from collie_tpu.ops import (adaptive_bpr_loss,
                            adaptive_hinge_loss,
                            bpr_loss,
                            hinge_loss,
                            ideal_difference_from_metadata,
                            mae_loss,
                            mse_loss,
                            warp_loss)
from collie_tpu.utils import (Timer,
                              convert_to_implicit,
                              create_ratings_matrix,
                              df_to_html,
                              df_to_interactions,
                              get_init_arguments,
                              get_random_seed,
                              merge_docstrings,
                              pandas_df_to_hdf5,
                              remove_users_with_fewer_than_n_interactions,
                              trunc_normal)


def __getattr__(name):
    """Lazily re-export the model / training / evaluation surface so importing
    ``collie_tpu.data`` alone does not pull in jax-heavy modules."""
    import importlib
    # NOTE: ``from collie_tpu import _lazy_exports`` would re-enter this
    # __getattr__; import_module targets the submodule directly
    lazy = importlib.import_module('collie_tpu._lazy_exports')
    if name in lazy.EXPORTS:
        return lazy.resolve(name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
