from .codec import (
    Cell,
    SSTableWriter,
    read_compression_info,
    read_data_rows,
    read_index_entries,
    read_summary_entries,
    write_sstable,
)
from .datasource import SSTableDataSource, register

__all__ = [
    "Cell",
    "SSTableWriter",
    "SSTableDataSource",
    "read_compression_info",
    "read_data_rows",
    "read_index_entries",
    "read_summary_entries",
    "register",
    "write_sstable",
]
