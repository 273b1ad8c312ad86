"""End-to-end Trainer throughput: featurize -> HDF5 -> GraphDataset -> train.

Measures what a user sees — epoch wall time including HDF5 loading, collation,
host->device transfer, and the jitted step — not just the inner train step
(bench.py / sol_perf.py cover that).

    python tests/perf/train_perf.py [entries] [epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

DATA = os.environ.get("DEEPRANK2_TPU_TEST_DATA", "/root/reference/tests/data")


def build_dataset(workdir: str, num_entries: int) -> str:
    import h5py

    from deeprank2_tpu.query import ProteinProteinInterfaceQuery, QueryCollection

    qc = QueryCollection()
    qc.add(
        ProteinProteinInterfaceQuery(
            pdb_path=f"{DATA}/pdb/1ATN/1ATN_1w.pdb",
            resolution="residue",
            chain_ids=["A", "B"],
            targets={"binary": 0},
        )
    )
    (path,) = qc.process(prefix=os.path.join(workdir, "seed"), feature_modules=["components", "contact"], cpu_count=1)

    train_path = os.path.join(workdir, "train.hdf5")
    with h5py.File(path, "r") as src, h5py.File(train_path, "w") as dst:
        entry = next(iter(src))
        for i in range(num_entries):
            src.copy(src[entry], dst, name=f"{entry}-{i}")
            dst[f"{entry}-{i}/target_values/binary"][()] = i % 2
    return train_path


def main(num_entries: int = 256, nepoch: int = 4, batch_size: int = 64) -> None:
    from deeprank2_tpu.dataset import GraphDataset
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.trainer import Trainer

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        train_path = build_dataset(tmp, num_entries)
        build_s = time.perf_counter() - t0

        dataset = GraphDataset(hdf5_path=train_path, target="binary", task="classif")
        trainer = Trainer(GINetDense, dataset_train=dataset, output_exporters=[])

        # epoch 0 evals + first-epoch compile happen inside train(); time the
        # steady state by training once for warmup and once for measurement.
        trainer.train(nepoch=1, batch_size=batch_size, validate=False, best_model=False)
        t0 = time.perf_counter()
        trainer.train(nepoch=nepoch, batch_size=batch_size, validate=False, best_model=False)
        epoch_s = (time.perf_counter() - t0) / nepoch

        edges = 0
        for i in range(len(dataset)):
            entry = dataset.get(i)
            edges += int(entry["edge_index"].shape[0]) * 2

        print(
            json.dumps(
                {
                    "entries": num_entries,
                    "batch_size": batch_size,
                    "featurize_and_build_s": round(build_s, 2),
                    "epoch_s": round(epoch_s, 3),
                    "entries_per_s": round(num_entries / epoch_s, 1),
                    "edges_per_s_end_to_end": round(edges / epoch_s, 1),
                }
            )
        )


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:3]))
