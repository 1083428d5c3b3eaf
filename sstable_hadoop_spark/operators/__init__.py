from .lww import (
    collect_rows,
    explode_cells,
    live_view,
    lww_cell,
    lww_row,
)

__all__ = ["collect_rows", "explode_cells", "live_view", "lww_cell", "lww_row"]
