"""HDF5 I/O: the reference's file contract (input / output / checkpoint).

Byte-compatible with the kspaceFirstOrder HDF5 formats documented at
/root/reference/main.cpp:350-803 and Hdf5/Hdf5File.h:300-409: same dataset names
(Utils/MatrixNames.h), dims ordering (C-order (nz, ny, nx) / (nt, nz, ny, nx) —
Hdf5File.cpp:396-420), scalar encodings (u64 / float32 at shape (1,1,1)), header
attributes (Hdf5FileHeader.cpp:62-88), chunking and gzip, and the compressed-stream
`c_*` attribute block (IndexOutputStream.cpp:147-157).
"""

from kwave_tpu.io import names
from kwave_tpu.io.hdf5 import (
    create_dataset,
    read_scalar,
    write_file_header,
    write_scalar,
)
from kwave_tpu.io.input_file import InputData, read_input_file, write_input_file
from kwave_tpu.io.output_file import (
    CompressionAttrs,
    create_compressed_dataset,
    create_cuboid_group,
    create_output_file,
    create_raw_dataset,
    write_aggregate,
    write_frame,
    write_frames,
)
from kwave_tpu.io.checkpoint import read_checkpoint, write_checkpoint

__all__ = [
    "names",
    "create_dataset",
    "read_scalar",
    "write_scalar",
    "write_file_header",
    "InputData",
    "read_input_file",
    "write_input_file",
    "CompressionAttrs",
    "create_output_file",
    "create_raw_dataset",
    "create_compressed_dataset",
    "create_cuboid_group",
    "write_frame",
    "write_frames",
    "write_aggregate",
    "read_checkpoint",
    "write_checkpoint",
]
