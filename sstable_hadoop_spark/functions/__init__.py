from .paths import companion_path, data_files, root_name
from .sinks import manifest_tsv, to_msgpack_base64_lines, to_text_lines

__all__ = [
    "companion_path",
    "data_files",
    "manifest_tsv",
    "root_name",
    "to_msgpack_base64_lines",
    "to_text_lines",
]
