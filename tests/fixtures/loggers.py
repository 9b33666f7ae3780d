"""Shared test logger: captures per-epoch train losses from the trainer's
``log_metrics`` protocol (the single definition — test modules import it
instead of re-declaring copies)."""


class EpochLossLogger:
    def __init__(self):
        self.epoch_losses = []

    def log_metrics(self, metrics, step):
        if 'train_loss_epoch' in metrics:
            self.epoch_losses.append(float(metrics['train_loss_epoch']))
