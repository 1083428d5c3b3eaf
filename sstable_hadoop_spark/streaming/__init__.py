from .windows import session_counts, sliding_counts, tumbling_counts
from .lww_stream import streaming_lww_cells

__all__ = ["session_counts", "sliding_counts", "tumbling_counts",
           "streaming_lww_cells"]
