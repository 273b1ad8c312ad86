"""Query pipeline: define data points, build featured graphs, write HDF5.

API-compatible with the reference (deeprank2/query.py): ``Query`` subclasses
``SingleResidueVariantQuery`` / ``ProteinProteinInterfaceQuery`` build graphs
from PDB files, and ``QueryCollection.process`` fans featurization out over a
host-side process pool with one HDF5 writer per worker process
(single-writer-per-file discipline, reference query.py:448-451).
"""

from __future__ import annotations

import importlib
import logging
import multiprocessing
import os
import pickle
import pkgutil
import re
import sys
import warnings
from dataclasses import MISSING, dataclass, field, fields
from functools import partial
from glob import glob
from random import randrange
from types import ModuleType
from typing import Literal

import h5py
import numpy as np

import deeprank2_tpu.features
from deeprank2_tpu.features import components, conservation, contact  # noqa: F401 (defaults)
from deeprank2_tpu.molstruct.aminoacid import AminoAcid, convert_aa_nomenclature
from deeprank2_tpu.molstruct.structure import SingleResidueVariant, StructureArrays
from deeprank2_tpu.utils.buildgraph import get_contact_atoms, get_structure, get_surrounding_residues
from deeprank2_tpu.utils.graph import Graph
from deeprank2_tpu.utils.grid import Augmentation, GridSettings, MapMethod, random_rotation_axis_angle
from deeprank2_tpu.utils.parsing.pssm import parse_pssm

_log = logging.getLogger(__name__)

VALID_RESOLUTIONS = ["atom", "residue"]


def _jax_backends_initialized() -> bool:
    """True when a JAX backend is live in this process (fork would then be
    unsafe for worker pools). Never *initializes* a backend itself."""
    try:
        return bool("jax" in sys.modules and sys.modules["jax"]._src.xla_bridge._backends)
    except AttributeError:
        return "jax" in sys.modules


@dataclass(repr=False, kw_only=True)
class Query:
    """Parent class of :class:`SingleResidueVariantQuery` and :class:`ProteinProteinInterfaceQuery`.

    Args:
        pdb_path: path to the PDB file to query.
        resolution: "residue" or "atom" node granularity.
        chain_ids: chain identifier(s).
        pssm_paths: chain id -> pssm file path.
        targets: target name -> value.
        influence_radius: inclusion radius in Å (defaults: residue 10, atom 4.5).
        max_edge_length: max edge distance in Å (defaults: residue 10, atom 4.5).
        suppress_pssm_errors: warn instead of raising on pssm/pdb mismatches.
    """

    pdb_path: str
    resolution: Literal["residue", "atom"]
    chain_ids: list[str] | str
    pssm_paths: dict[str, str] = field(default_factory=dict)
    targets: dict[str, float] = field(default_factory=dict)
    influence_radius: float | None = None
    max_edge_length: float | None = None
    suppress_pssm_errors: bool = False

    def __post_init__(self):
        self._model_id = os.path.splitext(os.path.basename(self.pdb_path))[0]
        self.variant = None  # set by SRV subclass

        if self.resolution == "residue":
            self.max_edge_length = 10 if not self.max_edge_length else self.max_edge_length
            self.influence_radius = 10 if not self.influence_radius else self.influence_radius
        elif self.resolution == "atom":
            self.max_edge_length = 4.5 if not self.max_edge_length else self.max_edge_length
            self.influence_radius = 4.5 if not self.influence_radius else self.influence_radius
        else:
            msg = f"Invalid resolution given ({self.resolution}). Must be one of {VALID_RESOLUTIONS}"
            raise ValueError(msg)

        if not isinstance(self.chain_ids, list):
            self.chain_ids = [self.chain_ids]

        for f in fields(self):
            value = getattr(self, f.name)
            if value is None and f.default_factory is not MISSING:
                setattr(self, f.name, f.default_factory())

    # ------------------------------------------------------------------
    def _set_graph_targets(self, graph: Graph) -> None:
        for target_name, target_data in self.targets.items():
            graph.targets[target_name] = target_data

    def _load_structure(self) -> StructureArrays:
        arrays = get_structure(self.pdb_path, self.model_id)
        if self._pssm_required:
            self._load_pssm_data(arrays)
        return arrays

    def _load_pssm_data(self, arrays: StructureArrays) -> None:
        self._check_pssm()
        for chain_id in arrays.chain_ids:
            if chain_id in self.pssm_paths:
                with open(self.pssm_paths[chain_id], encoding="utf-8") as f:
                    arrays.pssms[chain_id] = parse_pssm(f)

    def _check_pssm(self, verbosity: Literal[0, 1, 2] = 0) -> None:
        """Check that pssm rows match the pdb sequence (reference: query.py:107-162)."""
        if not self.pssm_paths:
            msg = "No pssm paths provided for conservation feature module."
            raise ValueError(msg)

        pssm_file_residues = {}
        for chain, pssm_path in self.pssm_paths.items():
            with open(pssm_path, encoding="utf-8") as f:
                lines = f.readlines()[1:]
            for line in lines:
                if not line.split():
                    continue
                pssm_file_residues[chain + line.split()[0].zfill(4)] = convert_aa_nomenclature(line.split()[1], 3)

        from deeprank2_tpu.io.pdb import parse_pdb
        from deeprank2_tpu.molstruct.aminoacid import AA_THREE_LETTER

        arrays = parse_pdb(self.pdb_path)
        pdb_file_residues = {}
        for r in range(arrays.num_residues):
            chain_id = arrays.chain_ids[arrays.res_chain[r]]
            if chain_id not in self.pssm_paths:
                continue
            aa_id = int(arrays.res_aa_ids[r])
            if aa_id < 0:
                continue
            icode = arrays.res_icodes[r] or ""
            pdb_file_residues[chain_id + f"{arrays.res_numbers[r]}{icode}".zfill(4)] = AA_THREE_LETTER[aa_id]

        mismatches = []
        missing_entries = []
        for residue, code in pdb_file_residues.items():
            if residue not in pssm_file_residues:
                missing_entries.append(residue)
            elif pssm_file_residues[residue] != code:
                mismatches.append(residue)

        if mismatches or missing_entries:
            error_message = f"Amino acids in PSSM files do not match pdb file for {os.path.split(self.pdb_path)[1]}."
            if verbosity:
                if mismatches:
                    error_message += f"\n\t{len(mismatches)} entries are incorrect."
                    if verbosity == 2:  # noqa: PLR2004
                        error_message += f":\n\t{mismatches}"
                if missing_entries:
                    error_message += f"\n\t{len(missing_entries)} entries are missing."
                    if verbosity == 2:  # noqa: PLR2004
                        error_message += f":\n\t{missing_entries}"
            if not self.suppress_pssm_errors:
                raise ValueError(error_message)
            warnings.warn(error_message)
            _log.warning(error_message)

    @property
    def model_id(self) -> str:
        """The ID of the model, usually a .PDB accession code."""
        return self._model_id

    @model_id.setter
    def model_id(self, value: str) -> None:
        self._model_id = value

    def __repr__(self) -> str:
        return f"{type(self)}({self.get_query_id()})"

    def build(self, feature_modules: list[str | ModuleType] | str | ModuleType) -> Graph:
        """Build the featured graph from the PDB structure.

        Args:
            feature_modules: modules (or names inside ``deeprank2_tpu.features``)
                whose ``add_features`` will annotate the graph.
        """
        if not isinstance(feature_modules, list):
            feature_modules = [feature_modules]
        feature_modules = [
            importlib.import_module("deeprank2_tpu.features." + module) if isinstance(module, str) else module for module in feature_modules
        ]
        self._pssm_required = conservation in feature_modules
        graph = self._build_helper()

        self._set_graph_targets(graph)
        for feature_module in feature_modules:
            feature_module.add_features(self.pdb_path, graph, self.variant)

        return graph

    def _build_helper(self) -> Graph:
        msg = "Must be defined in child classes."
        raise NotImplementedError(msg)

    def get_query_id(self) -> str:
        msg = "Must be defined in child classes."
        raise NotImplementedError(msg)


@dataclass(kw_only=True)
class SingleResidueVariantQuery(Query):
    """A query that builds a single-residue-variant graph.

    Additional args (vs :class:`Query`): ``variant_residue_number``,
    ``insertion_code``, ``wildtype_amino_acid``, ``variant_amino_acid``.
    """

    variant_residue_number: int
    insertion_code: str | None
    wildtype_amino_acid: AminoAcid
    variant_amino_acid: AminoAcid

    def __post_init__(self):
        super().__post_init__()
        if len(self.chain_ids) != 1:
            msg = f"`chain_ids` must contain exactly 1 chain for `SingleResidueVariantQuery` objects, but {len(self.chain_ids)} were given."
            raise ValueError(msg)
        self.variant_chain_id = self.chain_ids[0]

    @property
    def residue_id(self) -> str:
        """Residue number plus insertion code (if any)."""
        if self.insertion_code is not None:
            return f"{self.variant_residue_number}{self.insertion_code}"
        return str(self.variant_residue_number)

    def get_query_id(self) -> str:
        """The full query ID string."""
        return (
            f"{self.resolution}-srv:"
            f"{self.variant_chain_id}:{self.residue_id}:"
            f"{self.wildtype_amino_acid.name}->{self.variant_amino_acid.name}:{self.model_id}"
        )

    def _build_helper(self) -> Graph:
        arrays = self._load_structure()

        variant_residue_index = arrays.find_residue(self.variant_chain_id, self.variant_residue_number, self.insertion_code)
        if variant_residue_index < 0:
            msg = f"Residue not found in {self.pdb_path}: {self.variant_chain_id} {self.residue_id}"
            raise ValueError(msg)
        variant_residue = arrays.residue_view(variant_residue_index)
        self.variant = SingleResidueVariant(variant_residue, self.variant_amino_acid)

        residues = get_surrounding_residues(arrays, variant_residue_index, self.influence_radius)

        if self.resolution == "residue":
            graph = Graph.build_graph(arrays, residues, "residue", self.get_query_id(), self.max_edge_length)
        else:  # atom
            # all atoms of the surrounding amino-acid residues
            keep = residues[arrays.res_aa_ids[residues] >= 0]
            atoms = np.concatenate(
                [np.arange(arrays.res_atom_start[r], arrays.res_atom_start[r] + arrays.res_atom_count[r]) for r in keep]
            ).astype(np.int64)
            graph = Graph.build_graph(arrays, atoms, "atom", self.get_query_id(), self.max_edge_length)

        graph.center = variant_residue.get_center()
        return graph


@dataclass(kw_only=True)
class ProteinProteinInterfaceQuery(Query):
    """A query that builds a protein-protein interface graph."""

    def __post_init__(self):
        super().__post_init__()
        if len(self.chain_ids) != 2:  # noqa: PLR2004
            msg = f"`chain_ids` must contain exactly 2 chains for `ProteinProteinInterfaceQuery` objects, but {len(self.chain_ids)} was/were given."
            raise ValueError(msg)

    def get_query_id(self) -> str:
        """The full query ID string."""
        return f"{self.resolution}-ppi:{self.chain_ids[0]}-{self.chain_ids[1]}:{self.model_id}"

    def _build_helper(self) -> Graph:
        pdb_name = os.path.splitext(os.path.basename(self.pdb_path))[0]
        # the contact structure carries its own id (reference: buildgraph.py:103)
        arrays = get_structure(self.pdb_path, f"contact_atoms_{pdb_name}")

        contact_atoms = get_contact_atoms(arrays, self.chain_ids, self.influence_radius)
        if len(contact_atoms) == 0:
            msg = "No contact atoms found"
            raise ValueError(msg)

        if self.resolution == "atom":
            graph = Graph.build_graph(arrays, contact_atoms, "atom", self.get_query_id(), self.max_edge_length)
        else:
            residues = np.unique(arrays.atom_residue[contact_atoms])
            graph = Graph.build_graph(
                arrays,
                residues,
                "residue",
                self.get_query_id(),
                self.max_edge_length,
                atom_subset=contact_atoms,
            )

        graph.center = arrays.positions[contact_atoms].mean(axis=0)
        if self._pssm_required:
            self._load_pssm_data(arrays)
        return graph


class QueryCollection:
    """A collection of queries to be processed into one dataset.

    Mirrors the reference API (deeprank2/query.py:371): ``add`` dedups query ids
    by renaming, ``process`` runs the multiprocessing featurization fan-out.
    """

    def __init__(self):
        self._queries: list[Query] = []
        self._ids_count: dict[str, int] = {}
        self._prefix: str | None = None
        self._cpu_count: int | None = None
        self._grid_settings: GridSettings | None = None
        self._grid_map_method: MapMethod | None = None
        self._grid_augmentation_count: int = 0

    def add(self, query: Query, verbose: bool = False, warn_duplicate: bool = True) -> None:
        """Add a query; duplicate ids get renamed with a repeat suffix."""
        query_id = query.get_query_id()
        if verbose:
            _log.info(f"Adding query with ID {query_id}.")

        if query_id not in self._ids_count:
            self._ids_count[query_id] = 1
        else:
            self._ids_count[query_id] += 1
            new_id = query.model_id + "_" + str(self._ids_count[query_id])
            query.model_id = new_id
            if warn_duplicate:
                _log.warning(f"Query with ID {query_id} has already been added to the collection. Renaming it as {query.get_query_id()}")

        self._queries.append(query)

    def export_dict(self, dataset_path: str) -> None:
        """Pickle the whole collection."""
        with open(dataset_path, "wb") as pkl_file:
            pickle.dump(self, pkl_file)

    @property
    def queries(self) -> list[Query]:
        """The list of added queries."""
        return self._queries

    def __contains__(self, query: Query) -> bool:
        return query in self._queries

    def __iter__(self):
        return iter(self._queries)

    def __len__(self) -> int:
        return len(self._queries)

    def _process_one_query(self, query: Query, log_error_traceback: bool = False) -> None:
        """Build one query and append to this process's own HDF5 shard."""
        try:
            output_path = f"{self._prefix}-{os.getpid()}.hdf5"
            graph = query.build(self._feature_modules)
            graph.write_to_hdf5(output_path)

            if self._grid_settings is not None and self._grid_map_method is not None:
                graph.write_as_grid_to_hdf5(output_path, self._grid_settings, self._grid_map_method)
                for _ in range(self._grid_augmentation_count):
                    axis, angle = random_rotation_axis_angle(randrange(100))
                    augmentation = Augmentation(axis, angle)
                    graph.write_as_grid_to_hdf5(output_path, self._grid_settings, self._grid_map_method, augmentation)

        except (ValueError, AttributeError, KeyError, TimeoutError, OSError) as e:
            # OSError (incl. FileNotFoundError for missing pdb/pssm files) is
            # trapped too so one bad path never kills a whole processing run —
            # the reference's narrower tuple (query.py:472) lets it propagate.
            _log.warning(
                f"Graph/Query with ID {query.get_query_id()} ran into an Exception and was not written to the hdf5 file.\n"
                f"Exception found: {e.__class__.__name__}: {e}.\n"
                "You may proceed with your analysis, but this query will be ignored.\n",
            )
            if log_error_traceback:
                _log.exception(f"----Full error traceback:----\n{e}")

    def process(
        self,
        prefix: str = "processed-queries",
        feature_modules: list[ModuleType | str] | ModuleType | str | None = None,
        cpu_count: int | None = None,
        combine_output: bool = True,
        grid_settings: GridSettings | None = None,
        grid_map_method: MapMethod | None = None,
        grid_augmentation_count: int = 0,
        log_error_traceback: bool = False,
        mp_context: str | None = None,
        num_hosts: int | None = None,
        host_index: int | None = None,
        resume: bool = False,
    ) -> list[str]:
        """Render queries into graphs (and optionally grids) in parallel.

        Same parameters and defaults as the reference (query.py:481-569), plus:

        - ``mp_context``: multiprocessing start method ("fork"/"spawn"/
          "forkserver"). Defaults to "spawn" when JAX backends are already
          initialized in this process (fork-after-JAX can deadlock), else
          "fork".
        - ``num_hosts``/``host_index``: multi-host fan-out — this host
          processes ``queries[host_index::num_hosts]`` and writes
          ``<prefix>-host<h>.hdf5`` (single-writer-per-file discipline, like
          the per-PID worker shards). Defaults follow
          ``jax.process_count()/process_index()`` when a multi-host JAX
          runtime is initialized, else 1/0. Feed all per-host files to
          ``GraphDataset``/``GridDataset`` (they accept lists) — no cross-host
          merge step is needed.
        - ``resume``: skip queries whose entry already exists in this prefix's
          output files — checkpoint-restart for interrupted runs (the
          reference has no processing elasticity; SURVEY §5.3).
        """
        feature_modules = feature_modules or [components, contact]
        self._prefix = "processed-queries" if not prefix else re.sub(".hdf5$", "", prefix)

        if num_hosts is None or host_index is None:
            num_hosts, host_index = 1, 0
            # only consult jax when its backends are ALREADY initialized:
            # jax.process_count() itself initializes a backend, which would
            # silently flip the mp_context heuristic below to "spawn" for
            # every caller (and spawn re-imports the user's __main__).
            if _jax_backends_initialized():
                import jax

                try:
                    num_hosts = jax.process_count()
                    host_index = jax.process_index()
                except RuntimeError:
                    pass
        if not 0 <= host_index < num_hosts:
            msg = f"host_index {host_index} out of range for num_hosts {num_hosts}"
            raise ValueError(msg)
        host_queries = self.queries[host_index::num_hosts]
        if num_hosts > 1:
            self._prefix = f"{self._prefix}-host{host_index}"

        max_cpus = os.cpu_count()
        self._cpu_count = max_cpus if cpu_count is None else min(cpu_count, max_cpus)
        if cpu_count and self._cpu_count < cpu_count:
            _log.warning(f"\nTried to set {cpu_count} CPUs, but only {max_cpus} are present in the system.")

        self._feature_modules = self._set_feature_modules(feature_modules)
        self._grid_settings = grid_settings
        self._grid_map_method = grid_map_method

        if grid_augmentation_count < 0:
            msg = f"`grid_augmentation_count` cannot be negative, but was given as {grid_augmentation_count}"
            raise ValueError(msg)
        self._grid_augmentation_count = grid_augmentation_count

        if mp_context is None:
            mp_context = "spawn" if _jax_backends_initialized() else "fork"
        preexisting: set[str] = set()
        if resume:
            for path in glob(f"{self._prefix}.hdf5") + glob(f"{self._prefix}-*.hdf5"):
                try:
                    with h5py.File(path, "r") as f:
                        preexisting.update(f.keys())
                except OSError:
                    continue
            skipped = [q for q in host_queries if q.get_query_id() in preexisting]
            host_queries = [q for q in host_queries if q.get_query_id() not in preexisting]
            if skipped:
                _log.info(f"resume: skipping {len(skipped)} already-processed queries.")

        pool_function = partial(self._process_one_query, log_error_traceback=log_error_traceback)
        if self._cpu_count == 1:
            # single worker: run in-process. Same single-writer-per-file
            # semantics (one PID, one shard), none of the start-method
            # hazards (spawn re-imports the caller's __main__).
            for query in host_queries:
                pool_function(query)
        else:
            with multiprocessing.get_context(mp_context).Pool(self._cpu_count) as pool:
                pool.map(pool_function, host_queries)

        output_paths = glob(f"{self._prefix}-*.hdf5")
        if combine_output:
            for output_path in output_paths:
                with h5py.File(f"{self._prefix}.hdf5", "a") as f_dest, h5py.File(output_path, "r") as f_src:
                    for _, value in f_src.items():
                        f_src.copy(value, f_dest)
                os.remove(output_path)
            return glob(f"{self._prefix}.hdf5")

        # count only entries produced by THIS run: on resume the shard files
        # still hold previously processed entries, which would otherwise mask
        # failures (or report >100% processed)
        n_processed = 0
        for hdf5file in output_paths:
            with h5py.File(hdf5file, "r") as hdf5:
                n_processed += sum(1 for key in hdf5 if key not in preexisting)

        if not n_processed:
            msg = "No queries have been processed."
            raise ValueError(msg)
        if n_processed != len(host_queries):
            _log.warning(
                f"Not all queries have been processed. You can proceed with the analysis of {n_processed}/{len(host_queries)} queries.\n"
                "Set `log_error_traceback` to True for advanced troubleshooting.",
            )
        return output_paths

    def _set_feature_modules(self, feature_modules: list[ModuleType | str] | ModuleType | str) -> list[str]:
        """Normalize ``feature_modules`` to a list of module-name strings."""
        if feature_modules == "all":
            return [modname for _, modname, _ in pkgutil.iter_modules(deeprank2_tpu.features.__path__)]
        if isinstance(feature_modules, ModuleType):
            return [os.path.basename(feature_modules.__file__)[:-3]]
        if isinstance(feature_modules, str):
            return [re.sub(".py$", "", feature_modules)]
        if isinstance(feature_modules, list):
            invalid_inputs = [type(el) for el in feature_modules if not isinstance(el, str | ModuleType)]
            if invalid_inputs:
                msg = f"`feature_modules` contains invalid input ({invalid_inputs}). Only `str` and `ModuleType` are accepted."
                raise TypeError(msg)
            return [re.sub(".py$", "", m) if isinstance(m, str) else os.path.basename(m.__file__)[:-3] for m in feature_modules]
        msg = f"`feature_modules` has received an invalid input type: {type(feature_modules)}. Only `str` and `ModuleType` are accepted."
        raise TypeError(msg)
