"""Import-path parity module: ``collie_tpu.interactions`` mirrors
``collie.interactions`` (reference ``/root/reference/collie/interactions/__init__.py``)."""
from collie_tpu.data.interactions import (BaseInteractions,
                                          ExplicitInteractions,
                                          HDF5Interactions,
                                          Interactions)
from collie_tpu.data.loaders import (ApproximateNegativeSamplingInteractionsDataLoader,
                                     BaseInteractionsDataLoader,
                                     HDF5InteractionsDataLoader,
                                     InteractionsDataLoader)
from collie_tpu.data.sampling import NegativeSampler

__all__ = [
    'ApproximateNegativeSamplingInteractionsDataLoader', 'BaseInteractions',
    'BaseInteractionsDataLoader', 'ExplicitInteractions', 'HDF5Interactions',
    'HDF5InteractionsDataLoader', 'Interactions', 'InteractionsDataLoader',
    'NegativeSampler',
]
