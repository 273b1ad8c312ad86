"""SRV featurization benchmark (the reference's README protocol,
tests/perf/srv_perf.py: residue graphs around variant residues, radius 10 Å,
feature set without irc).

Run directly: ``python tests/perf/srv_perf.py [pdb_path] [residues...]``.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

FEATURE_MODULES = ["components", "contact", "exposure", "secondary_structure", "surfacearea"]


def run(pdb_path: str, residues: list[int], chain_id: str = "A", with_grid: bool = False) -> dict:
    from deeprank2_tpu.molstruct.aminoacid import alanine, phenylalanine
    from deeprank2_tpu.query import SingleResidueVariantQuery
    from deeprank2_tpu.utils.grid import GridSettings, MapMethod

    grid_settings = GridSettings(points_counts=[35, 30, 30], sizes=[1.0, 1.0, 1.0])

    times = []
    sizes = []
    with tempfile.TemporaryDirectory() as tmp:
        for res in residues:
            out = os.path.join(tmp, f"srv_{res}.hdf5")
            query = SingleResidueVariantQuery(
                pdb_path=pdb_path,
                resolution="residue",
                chain_ids=chain_id,
                variant_residue_number=res,
                insertion_code=None,
                wildtype_amino_acid=alanine,
                variant_amino_acid=phenylalanine,
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
        "structures": len(residues),
        "time_mean_s": statistics.mean(times),
        "time_std_s": statistics.stdev(times) if len(times) > 1 else 0.0,
        "mb_mean": statistics.mean(sizes),
    }


if __name__ == "__main__":
    pdb_path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/data/pdb/101M/101M.pdb"
    residues = [int(r) for r in sys.argv[2:]] or [20, 25, 27, 64, 89, 101, 118, 136]
    stats = run(pdb_path, residues)
    print(
        f"SRV featurization (graph only): {stats['time_mean_s']:.3f} s/structure "
        f"(std {stats['time_std_s']:.3f}) over {stats['structures']} variants; "
        f"{stats['mb_mean']:.2f} MB/structure  [reference baseline: 2.20 s, 0.05 MB]"
    )
    stats = run(pdb_path, residues, with_grid=True)
    print(
        f"SRV featurization (graph+grid): {stats['time_mean_s']:.3f} s/structure "
        f"(std {stats['time_std_s']:.3f}) over {stats['structures']} variants; "
        f"{stats['mb_mean']:.2f} MB/structure  [reference baseline: 2.85 s, 17.52 MB]"
    )
