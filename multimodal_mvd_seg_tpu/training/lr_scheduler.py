"""Polynomial LR decay.

Parity: reference nnunetv2/training/lr_scheduler/polylr.py:4-21
(PolyLRScheduler: lr = initial * (1 - epoch/max_epochs)^0.9)."""


def poly_lr(initial_lr: float, epoch: int, max_epochs: int,
            exponent: float = 0.9) -> float:
    return initial_lr * (1 - epoch / max_epochs) ** exponent


class PolyLRScheduler:
    def __init__(self, initial_lr: float, max_steps: int, exponent: float = 0.9):
        self.initial_lr = initial_lr
        self.max_steps = max_steps
        self.exponent = exponent
        self.ctr = 0

    def step(self, current_step=None) -> float:
        if current_step is None or current_step == -1:
            current_step = self.ctr
            self.ctr += 1
        return poly_lr(self.initial_lr, current_step, self.max_steps,
                       self.exponent)
