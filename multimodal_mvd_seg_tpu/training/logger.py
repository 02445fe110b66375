"""In-memory training logger with EMA pseudo-Dice and progress.png.

Parity: reference nnunetv2/training/logging/nnunet_logger.py:17-105 — fixed
per-epoch key lists, EMA foreground Dice (λ=0.9) computed on log, checkpoint
round-trip, seaborn/matplotlib progress plot."""

from typing import Optional

import numpy as np


class MVDSegLogger:
    def __init__(self, verbose: bool = False):
        self.my_fantastic_logging = {
            'mean_fg_dice': [],
            'ema_fg_dice': [],
            'dice_per_class_or_region': [],
            'train_losses': [],
            'val_losses': [],
            'lrs': [],
            'epoch_start_timestamps': [],
            'epoch_end_timestamps': [],
        }
        self.verbose = verbose

    def log(self, key, value, epoch: int):
        assert key in self.my_fantastic_logging, f"unknown log key {key!r}"
        if self.verbose:
            print(f"logging {key}: {value} for epoch {epoch}")
        lst = self.my_fantastic_logging[key]
        if len(lst) < epoch + 1:
            lst.extend([None] * (epoch + 1 - len(lst)))
        lst[epoch] = value

        # EMA pseudo-Dice (reference nnunet_logger.py:49-52, λ=0.9)
        if key == 'mean_fg_dice':
            ema = self.my_fantastic_logging['ema_fg_dice']
            prev = ema[epoch - 1] if epoch > 0 and len(ema) >= epoch and \
                ema[epoch - 1] is not None else None
            new_ema = value if prev is None else prev * 0.9 + 0.1 * value
            self.log('ema_fg_dice', new_ema, epoch)

    def plot_progress_png(self, output_folder: str):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os

        L = self.my_fantastic_logging
        epoch = min(len(L['train_losses']), len(L['mean_fg_dice'])) - 1
        if epoch < 0:
            return
        xs = list(range(epoch + 1))
        fig, axes = plt.subplots(3, 1, figsize=(10, 12))
        ax = axes[0]
        ax.plot(xs, L['train_losses'][:epoch + 1], color='b', ls='-',
                label="loss_tr")
        if any(v is not None for v in L['val_losses'][:epoch + 1]):
            ax.plot(xs, L['val_losses'][:epoch + 1], color='r', ls='-',
                    label="loss_val")
        ax2 = ax.twinx()
        ax2.plot(xs, L['mean_fg_dice'][:epoch + 1], color='g', ls='dotted',
                 label="pseudo dice")
        ax2.plot(xs, L['ema_fg_dice'][:epoch + 1], color='g', ls='-',
                 label="pseudo dice (mov. avg.)")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax2.set_ylabel("pseudo dice")
        ax.legend(loc=(0, 1))
        ax2.legend(loc=(0.3, 1))

        ax = axes[1]
        times = [e - s for s, e in zip(L['epoch_start_timestamps'][:epoch + 1],
                                       L['epoch_end_timestamps'][:epoch + 1])
                 if s is not None and e is not None]
        ax.plot(range(len(times)), times, color='b', ls='-', label="epoch time")
        ax.set_xlabel("epoch")
        ax.set_ylabel("time [s]")
        ax.legend(loc=(0, 1))

        ax = axes[2]
        ax.plot(xs, L['lrs'][:epoch + 1], color='b', ls='-', label="lr")
        ax.set_xlabel("epoch")
        ax.set_ylabel("learning rate")
        ax.legend(loc=(0, 1))

        plt.tight_layout()
        fig.savefig(os.path.join(output_folder, "progress.png"))
        plt.close(fig)

    def get_checkpoint(self) -> dict:
        return self.my_fantastic_logging

    def load_checkpoint(self, checkpoint: dict):
        self.my_fantastic_logging = checkpoint


# legacy alias
nnUNetLogger = MVDSegLogger
