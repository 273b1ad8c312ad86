"""PPI featurization benchmark (the reference's README protocol,
tests/perf/ppi_perf.py:22-34: per-structure wall time + HDF5 size, atomic
resolution, 5.5 Å cutoff, the 6-module feature set, grid 35x30x30 Gaussian).

Run directly: ``python tests/perf/ppi_perf.py [pdb_dir]``.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

FEATURE_MODULES = ["components", "contact", "exposure", "irc", "secondary_structure", "surfacearea"]
CUTOFF = 5.5  # reference ppi_perf.py:23 interface_distance_cutoff


def run(pdb_files: list[str], chain_ids=("A", "B"), resolution: str = "atom", with_grid: bool = False) -> dict:
    from deeprank2_tpu.query import ProteinProteinInterfaceQuery
    from deeprank2_tpu.utils.grid import GridSettings, MapMethod

    grid_settings = GridSettings(points_counts=[35, 30, 30], sizes=[1.0, 1.0, 1.0])

    times = []
    sizes = []
    with tempfile.TemporaryDirectory() as tmp:
        for pdb_path in pdb_files:
            out = os.path.join(tmp, os.path.basename(pdb_path) + ".hdf5")
            query = ProteinProteinInterfaceQuery(
                pdb_path=pdb_path,
                resolution=resolution,
                chain_ids=list(chain_ids),
                influence_radius=CUTOFF,
                max_edge_length=CUTOFF,
                targets={"binary": 0},
            )
            t0 = time.perf_counter()
            graph = query.build(FEATURE_MODULES)
            graph.write_to_hdf5(out)
            if with_grid:
                graph.write_as_grid_to_hdf5(out, grid_settings, MapMethod.GAUSSIAN)
            times.append(time.perf_counter() - t0)
            sizes.append(os.path.getsize(out) / 1e6)

    return {
        "structures": len(pdb_files),
        "time_mean_s": statistics.mean(times),
        "time_std_s": statistics.stdev(times) if len(times) > 1 else 0.0,
        "mb_mean": statistics.mean(sizes),
    }


if __name__ == "__main__":
    import glob

    pdb_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/data/pdb/1ATN"
    files = sorted(glob.glob(os.path.join(pdb_dir, "*.pdb")))
    stats = run(files)
    print(
        f"PPI featurization (graph only): {stats['time_mean_s']:.3f} s/structure "
        f"(std {stats['time_std_s']:.3f}) over {stats['structures']} structures; "
        f"{stats['mb_mean']:.2f} MB/structure  [reference baseline: 2.99 s, 0.54 MB]"
    )
    stats = run(files, with_grid=True)
    print(
        f"PPI featurization (graph+grid): {stats['time_mean_s']:.3f} s/structure "
        f"(std {stats['time_std_s']:.3f}) over {stats['structures']} structures; "
        f"{stats['mb_mean']:.2f} MB/structure  [reference baseline: 11.35 s, 16.09 MB]"
    )
