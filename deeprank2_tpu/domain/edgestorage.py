"""Canonical HDF5 dataset names for edge features.

Schema-compatible with the reference (deeprank2/domain/edgestorage.py).
"""

## main group
EDGE = "edge_features"

## metafeatures
NAME = "_name"
INDEX = "_index"

## generic features
DISTANCE = "distance"
SAMECHAIN = "same_chain"
SAMERES = "same_res"

## interactions
COVALENT = "covalent"
ELEC = "electrostatic"
VDW = "vanderwaals"
