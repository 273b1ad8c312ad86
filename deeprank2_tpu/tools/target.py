"""Target tools: add labels to HDF5 datasets and compute docking-quality scores
(reference: deeprank2/tools/target.py)."""

from __future__ import annotations

import glob
import logging
import os

import h5py
import numpy as np

from deeprank2_tpu.domain import targetstorage as targets
from deeprank2_tpu.tools.similarity import StructureSimilarity

_log = logging.getLogger(__name__)
MIN_IRMS_FOR_BINARY = 4


def add_target(
    graph_path: str | list[str],
    target_name: str,
    target_list: str,
    sep: str = " ",
) -> None:
    """Add a target value to all matching entries of hdf5 file(s).

    ``target_list`` is a text file of ``<entry-id> <value>`` lines (reference
    format, target.py:15-43).
    """
    labels = np.loadtxt(target_list, delimiter=sep, usecols=[0], dtype=str)
    values = np.loadtxt(target_list, delimiter=sep, usecols=[1])
    target_dict = dict(zip(np.atleast_1d(labels), np.atleast_1d(values)))

    if isinstance(graph_path, str) and os.path.isdir(graph_path):
        graphs = glob.glob(f"{graph_path}/*.hdf5")
    elif isinstance(graph_path, str) and os.path.isfile(graph_path):
        graphs = [graph_path]
    elif isinstance(graph_path, list):
        graphs = graph_path
    else:
        msg = "Incorrect input passed."
        raise TypeError(msg)

    for hdf5 in graphs:
        _log.info(hdf5)
        if not os.path.isfile(hdf5):
            msg = f"File {hdf5} not found."
            raise FileNotFoundError(msg)

        try:
            with h5py.File(hdf5, "a") as f5:
                for model, value in target_dict.items():
                    if model not in f5:
                        _log.info(f"no graph for {model}")
                        continue
                    model_gp = f5[model]
                    if targets.VALUES not in model_gp:
                        model_gp.create_group(targets.VALUES)
                    group = f5[f"{model}/{targets.VALUES}/"]
                    if target_name in group:
                        del group[target_name]
                    group.create_dataset(target_name, data=value)
        except OSError:  # noqa: PERF203
            _log.info(f"no graph for {hdf5}")


def compute_ppi_scores(pdb_path: str, reference_pdb_path: str) -> dict[str, float | int]:
    """Structure-similarity scores of a docking model vs the native structure.

    Returns ``lrmsd``, ``irmsd``, ``fnat``, ``dockq``, ``binary`` (irmsd < 4 Å) and ``capri_class``
    (1 high ... 4 incorrect), matching the reference semantics
    (target.py:80-123). Instead of the reference's on-disk ``<ref>.lzone``/
    ``.izone`` files, the native's parse, interface zone, and contact set
    are cached in memory per reference path (tools/similarity.py:
    reference_bundle) — scoring many decoys of one complex zones it once.
    """
    sim = StructureSimilarity(pdb_path, reference_pdb_path)

    scores: dict[str, float | int] = {}
    scores[targets.LRMSD] = sim.compute_lrmsd_fast(method="svd")
    scores[targets.IRMSD] = sim.compute_irmsd_fast(method="svd")
    scores[targets.FNAT] = sim.compute_fnat_fast()
    scores[targets.DOCKQ] = sim.compute_DockQScore(scores[targets.FNAT], scores[targets.LRMSD], scores[targets.IRMSD])
    scores[targets.BINARY] = scores[targets.IRMSD] < MIN_IRMS_FOR_BINARY

    scores[targets.CAPRI] = 4
    for thr, val in zip([4.0, 2.0, 1.0], [3, 2, 1]):
        if scores[targets.IRMSD] < thr:
            scores[targets.CAPRI] = val

    return scores
