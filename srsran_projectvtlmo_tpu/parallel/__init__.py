from .mesh import cell_mesh, shard_leading
from .multi_cell import build_multi_cell_pusch_rx, build_multi_cell_ulsch_tx
