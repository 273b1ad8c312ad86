"""Early stopping on validation loss with an overfit (val-train gap) guard
(reference: deeprank2/utils/earlystopping.py — patience/delta/maxgap/min_epoch
semantics reproduced exactly)."""

from __future__ import annotations

from collections.abc import Callable


class EarlyStopping:
    """Signals training termination when validation loss stops improving for
    ``patience`` epochs, or when ``val_loss - train_loss > maxgap`` after
    ``min_epoch``."""

    def __init__(
        self,
        patience: int = 10,
        delta: float = 0,
        maxgap: float | None = None,
        min_epoch: int = 10,
        verbose: bool = True,
        trace_func: Callable = print,
    ):
        self.patience = patience if patience is not None else 10
        self.delta = delta
        self.maxgap = maxgap
        self.min_epoch = min_epoch
        self.verbose = verbose
        self.trace_func = trace_func

        self.early_stop = False
        self.counter = 0
        self.best_score = None
        self.val_loss_min = None

    def __call__(self, epoch: int, val_loss: float, train_loss: float | None = None) -> None:
        score = -val_loss

        if self.best_score is None:
            self.best_score = score
            self.val_loss_min = val_loss
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.verbose:
                extra_trace = f"more than {self.delta} " if self.delta else ""
                self.trace_func(
                    f"Validation loss did not decrease {extra_trace}({self.val_loss_min:.6f} --> {val_loss:.6f}). "
                    f"EarlyStopping counter: {self.counter} out of {self.patience}",
                )
            if self.counter >= self.patience:
                self.trace_func(f"EarlyStopping activated at epoch # {epoch} because patience of {self.patience} has been reached.")
                self.early_stop = True
        else:
            if self.verbose:
                self.trace_func(f"Validation loss decreased ({self.val_loss_min:.6f} --> {val_loss:.6f}).")
            self.best_score = score
            self.counter = 0

        if score >= self.best_score:
            self.best_score = score
            self.val_loss_min = val_loss

        if self.maxgap and epoch > self.min_epoch:
            if train_loss is None:
                msg = "Cannot compute gap because no train_loss is provided to EarlyStopping."
                raise ValueError(msg)
            gap = val_loss - train_loss
            if gap > self.maxgap:
                self.trace_func(
                    f"EarlyStopping activated at epoch # {epoch} due to overfitting. "
                    f"The difference between validation and training loss of {gap} exceeds the maximum allowed ({self.maxgap})",
                )
                self.early_stop = True
