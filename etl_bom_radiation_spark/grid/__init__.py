from .decode import decode_grids, read_grid_files, with_filename_metadata
from .filenames import parse_run_timestamp

__all__ = [
    "decode_grids",
    "read_grid_files",
    "with_filename_metadata",
    "parse_run_timestamp",
]
