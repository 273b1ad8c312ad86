"""HDF5 group name for grid-mapped features (reference: deeprank2/domain/gridstorage.py)."""

MAPPED_FEATURES = "mapped_features"
