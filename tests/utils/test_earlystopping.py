"""EarlyStopping oracles (reference: tests/utils/test_earlystopping.py).

The loss sequences and expected stop epochs are the reference's behavior spec:
patience counts epochs without improvement beyond delta; maxgap stops when
val - train exceeds the threshold after min_epoch.
"""

from deeprank2_tpu.utils.earlystopping import EarlyStopping

VAL_LOSSES = [3, 2, 1, 2, 0.5, 2, 3, 4, 5, 6, 7]
TRAIN_LOSSES = [3, 2, 1, 2, 0.5, 2, 3, 4, 5, 1, 7]


def _run(patience: int = 10, delta: float = 0, maxgap: float | None = None) -> int:
    stopper = EarlyStopping(patience=patience, delta=delta, maxgap=maxgap, min_epoch=0, verbose=False)
    for epoch, val_loss in enumerate(VAL_LOSSES):
        stopper(epoch, val_loss, TRAIN_LOSSES[epoch])
        if stopper.early_stop:
            break
    return epoch


def test_patience() -> None:
    # best val at epoch 4; patience 3 -> stop at epoch 7
    assert _run(patience=3) == 7


def test_patience_with_delta() -> None:
    # improvements smaller than delta=1 don't reset the counter -> stop at 5
    assert _run(patience=3, delta=1) == 5


def test_maxgap() -> None:
    # val(6) - train(1) = 5 > maxgap=1 at epoch 9
    assert _run(maxgap=1) == 9


def test_min_epoch_defers_maxgap() -> None:
    stopper = EarlyStopping(patience=100, maxgap=1, min_epoch=100, verbose=False)
    for epoch, val_loss in enumerate(VAL_LOSSES):
        stopper(epoch, val_loss, TRAIN_LOSSES[epoch])
    assert not stopper.early_stop
