"""Dataset build + storage (.npz), reference-layout compatible."""

from .io import export_reference_npz, load_reference_npz, dataset_path

__all__ = ["export_reference_npz", "load_reference_npz", "dataset_path"]
