"""Dataset build + storage (.npz), reference-layout compatible."""

from .io import export_reference_npz, dataset_path
from .fenics_import import (
    load_reference_npz,
    mixed_import_permutation,
    match_permutation,
)

__all__ = [
    "export_reference_npz",
    "dataset_path",
    "load_reference_npz",
    "mixed_import_permutation",
    "match_permutation",
]
