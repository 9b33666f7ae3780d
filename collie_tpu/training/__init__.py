"""Training: jitted engines, optax optimizer specs, host-side lr schedulers."""
from collie_tpu.training.optimizers import (OptimizerSpec,
                                            build_transform,
                                            get_lr,
                                            set_lr,
                                            split_bias_keys)
from collie_tpu.training.schedulers import ReduceLROnPlateau, StepLR, resolve_scheduler
from collie_tpu.training.trainer import CollieMinimalTrainer, CollieTrainer

__all__ = [
    'CollieMinimalTrainer', 'CollieTrainer', 'OptimizerSpec', 'ReduceLROnPlateau',
    'StepLR', 'build_transform', 'get_lr', 'resolve_scheduler', 'set_lr',
    'split_bias_keys',
]
