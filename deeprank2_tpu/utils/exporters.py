"""Pluggable epoch-level output exporters (reference: deeprank2/utils/exporters.py).

Same plugin surface: ``process(pass_name, epoch_number, entry_names,
output_values, target_values, loss)`` per epoch, compatibility validation
against output/target shapes, and the same three built-ins (HDF5, TensorBoard
binary-classification metrics, scatter plots). Metrics are computed with
numpy/sklearn instead of torch.

The HDF5 exporter writes with h5py directly (pandas ``to_hdf`` needs pytables,
which is not a dependency here); :meth:`HDF5OutputExporter.read` returns the
same per-phase DataFrame users would get from ``pd.read_hdf``.
"""

from __future__ import annotations

import logging
import os
import random
from math import sqrt

import numpy as np

_log = logging.getLogger(__name__)


class OutputExporter:
    """General exporter called whenever the network produces outputs."""

    def __init__(self, directory_path: str | None = None):
        if directory_path is None:
            directory_path = "./output"
        self._directory_path = directory_path
        if not os.path.exists(self._directory_path):
            os.makedirs(self._directory_path)

    def __enter__(self):
        return self

    def __exit__(self, exception_type, exception, traceback):
        """Overridable."""

    def process(
        self,
        pass_name: str,
        epoch_number: int,
        entry_names: list[str],
        output_values: list,
        target_values: list,
        loss: float,
    ) -> None:
        """The entry_names, output_values, target_values MUST have the same length."""

    def is_compatible_with(self, output_data_shape: int, target_data_shape: int | None = None) -> bool:  # noqa: ARG002
        """True if this exporter can work with the given data shapes."""
        return True


class OutputExporterCollection:
    """Runs several exporters at once."""

    def __init__(self, *args: OutputExporter):
        self._output_exporters = args

    def __enter__(self):
        for output_exporter in self._output_exporters:
            output_exporter.__enter__()
        return self

    def __exit__(self, exception_type, exception, traceback):
        for output_exporter in self._output_exporters:
            output_exporter.__exit__(exception_type, exception, traceback)

    def process(self, *args) -> None:
        for output_exporter in self._output_exporters:
            output_exporter.process(*args)

    def __iter__(self):
        return iter(self._output_exporters)


class TensorboardBinaryClassificationExporter(OutputExporter):
    """TensorBoard metrics for binary classification: cross entropy, MCC,
    accuracy, ROC AUC per epoch."""

    def __init__(self, directory_path: str):
        super().__init__(directory_path)
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(log_dir=directory_path)

    def __enter__(self):
        self._writer.__enter__()
        return self

    def __exit__(self, exception_type, exception, traceback):
        self._writer.__exit__(exception_type, exception, traceback)

    def process(
        self,
        pass_name: str,
        epoch_number: int,
        entry_names: list[str],
        output_values: list,
        target_values: list,
        loss: float,  # noqa: ARG002
    ) -> None:
        """Write classification metrics to tensorboard."""
        outputs = np.asarray(output_values, dtype=np.float64)  # [N, 2] probabilities
        target = np.asarray(target_values, dtype=np.int64)

        # cross entropy on the probability outputs (torch parity: the trainer
        # exports softmax probabilities, so re-log them)
        logp = np.log(np.clip(outputs, 1e-12, None))
        logp = logp - np.log(np.sum(np.exp(logp), axis=1, keepdims=True))
        ce_loss = float(np.mean(-logp[np.arange(len(target)), target]))
        self._writer.add_scalar(f"{pass_name} cross entropy loss", ce_loss, epoch_number)

        probabilities = outputs[:, 1]
        predictions = np.argmax(outputs, axis=1)
        tp = int(np.sum((predictions > 0) & (target > 0)))
        tn = int(np.sum((predictions <= 0) & (target <= 0)))
        fp = int(np.sum((predictions > 0) & (target <= 0)))
        fn = int(np.sum((predictions <= 0) & (target > 0)))

        mcc_numerator = tn * tp - fp * fn
        if mcc_numerator == 0:
            self._writer.add_scalar(f"{pass_name} MCC", 0.0, epoch_number)
        else:
            mcc_denominator = sqrt((tn + fn) * (fp + tp) * (tn + fp) * (fn + tp))
            if mcc_denominator != 0:
                self._writer.add_scalar(f"{pass_name} MCC", mcc_numerator / mcc_denominator, epoch_number)

        accuracy = (tp + tn) / max(tp + tn + fp + fn, 1)
        self._writer.add_scalar(f"{pass_name} accuracy", accuracy, epoch_number)

        if len(set(target.tolist())) == 2:  # noqa: PLR2004
            from sklearn.metrics import roc_auc_score

            roc_auc = roc_auc_score(target, probabilities)
            self._writer.add_scalar(f"{pass_name} ROC AUC", roc_auc, epoch_number)

    def is_compatible_with(self, output_data_shape: int, target_data_shape: int | None = None) -> bool:
        """Binary classification: two-dimensional output, scalar target."""
        return output_data_shape == 2 and target_data_shape == 1  # noqa: PLR2004


class ScatterPlotExporter(OutputExporter):
    """Scatter plots of target (x) vs output (y), every ``epoch_interval`` epochs."""

    def __init__(self, directory_path: str, epoch_interval: int = 1):
        super().__init__(directory_path)
        self._epoch_interval = epoch_interval

    def __enter__(self):
        self._plot_data = {}
        return self

    def __exit__(self, exception_type, exception, traceback):
        self._plot_data.clear()

    def get_filename(self, epoch_number: int) -> str:
        """Path of the plot image for one epoch."""
        return os.path.join(self._directory_path, f"scatter-{epoch_number}.png")

    @staticmethod
    def _get_color(pass_name: str) -> str:
        pass_name = pass_name.lower().strip()
        if pass_name in ("train", "training"):
            return "blue"
        if pass_name in ("eval", "valid", "validation"):
            return "red"
        if pass_name in ("test", "testing"):
            return "green"
        return random.choice(["yellow", "cyan", "magenta"])  # noqa: S311

    @staticmethod
    def _plot(epoch_number: int, data: dict, png_path: str) -> None:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        plt.title(f"Epoch {epoch_number}")
        for pass_name, (truth_values, prediction_values) in data.items():
            plt.scatter(truth_values, prediction_values, color=ScatterPlotExporter._get_color(pass_name), label=pass_name)
        plt.xlabel("truth")
        plt.ylabel("prediction")
        plt.legend()
        plt.savefig(png_path)
        plt.close()

    def process(
        self,
        pass_name: str,
        epoch_number: int,
        entry_names: list[str],  # noqa: ARG002
        output_values: list,
        target_values: list,
        loss: float,  # noqa: ARG002
    ) -> None:
        """Store + redraw the plot if the epoch matches the interval."""
        if epoch_number % self._epoch_interval == 0:
            if epoch_number not in self._plot_data:
                self._plot_data[epoch_number] = {}
            self._plot_data[epoch_number][pass_name] = (target_values, output_values)
            self._plot(epoch_number, self._plot_data[epoch_number], self.get_filename(epoch_number))

    def is_compatible_with(self, output_data_shape: int, target_data_shape: int | None = None) -> bool:
        """Regression only: scalar outputs and targets."""
        return output_data_shape == 1 and target_data_shape == 1


class HDF5OutputExporter(OutputExporter):
    """Saves every data point (phase, epoch, entry, output, target, loss) to
    ``output_exporter.hdf5`` — the most general exporter; read back with
    :meth:`read` into a pandas DataFrame."""

    def __init__(self, directory_path: str):
        self.phase = None
        super().__init__(directory_path)

    def __enter__(self):
        self._rows: list[tuple] = []
        return self

    def __exit__(self, exception_type, exception, traceback):
        if self.phase is not None:
            if self.phase == "validation":
                self.phase = "training"
            self._flush(self.phase)

    @property
    def path(self) -> str:
        return os.path.join(self._directory_path, "output_exporter.hdf5")

    def _flush(self, key: str) -> None:
        import h5py

        rows = self._rows
        with h5py.File(self.path, "a") as f:
            if key in f:
                del f[key]
            grp = f.create_group(key)
            grp.create_dataset("phase", data=np.array([r[0] for r in rows]).astype("S"))
            # epoch may be None when testing a pretrained model whose
            # checkpoint predates a best-model save (the reference stores
            # NaN via pandas in that case) -> -1 marks "unknown epoch"
            grp.create_dataset("epoch", data=np.array([-1 if r[1] is None else r[1] for r in rows], dtype=np.int64))
            grp.create_dataset("entry", data=np.array([r[2] for r in rows]).astype("S"))
            outputs = [np.atleast_1d(np.asarray(r[3], dtype=np.float64)) for r in rows]
            width = max((o.shape[0] for o in outputs), default=1)
            grp.create_dataset("output", data=np.stack([np.pad(o, (0, width - o.shape[0])) for o in outputs]) if rows else np.zeros((0, 1)))
            grp.create_dataset(
                "target",
                data=np.array([np.nan if r[4] is None else float(r[4]) for r in rows], dtype=np.float64),
            )
            grp.create_dataset(
                "loss",
                data=np.array([np.nan if r[5] is None else float(r[5]) for r in rows], dtype=np.float64),
            )

    def read(self, phase: str):
        """Read one phase back as a pandas DataFrame (columns like the reference's)."""
        import h5py
        import pandas as pd

        with h5py.File(self.path, "r") as f:
            grp = f[phase]
            outputs = grp["output"][()]
            return pd.DataFrame(
                {
                    "phase": [s.decode() for s in grp["phase"][()]],
                    "epoch": grp["epoch"][()],
                    "entry": [s.decode() for s in grp["entry"][()]],
                    "output": [row.tolist() if row.shape[0] > 1 else float(row[0]) for row in outputs],
                    "target": grp["target"][()],
                    "loss": grp["loss"][()],
                }
            )

    def process(
        self,
        pass_name: str,
        epoch_number: int,
        entry_names: list[str],
        output_values: list,
        target_values: list,
        loss: float,
    ) -> None:
        """Append this epoch's rows."""
        self.phase = pass_name
        for name, output, target in zip(entry_names, output_values, target_values):
            self._rows.append((pass_name, epoch_number, name, output, target, loss))
