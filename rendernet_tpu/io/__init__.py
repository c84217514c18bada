from rendernet_tpu.io import binvox
from rendernet_tpu.io.binvox import (
    Voxels,
    load_binvox,
    read_as_3d_array,
    read_as_coord_array,
    save_binvox,
)
from rendernet_tpu.io import native
from rendernet_tpu.io.tar_archive import NpyTarReader, NpyTarWriter

__all__ = [
    "native",
    "binvox",
    "Voxels",
    "load_binvox",
    "read_as_3d_array",
    "read_as_coord_array",
    "save_binvox",
    "NpyTarReader",
    "NpyTarWriter",
]
