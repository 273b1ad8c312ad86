"""Default target names and task names in HDF5 files.

Schema-compatible with the reference (deeprank2/domain/targetstorage.py).
"""

## main group
VALUES = "target_values"

## classification tasks
BINARY = "binary"
CAPRI = "capri_class"

## regression tasks
IRMSD = "irmsd"
LRMSD = "lrmsd"
FNAT = "fnat"
DOCKQ = "dockq"

## task names
REGRESS = "regress"
CLASSIF = "classif"
