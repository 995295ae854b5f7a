from .ldpc_params import (
    ALL_LIFTING_SIZES,
    MAX_LIFTING_SIZE,
    MAX_CODEBLOCK_SIZE,
    MAX_MESSAGE_SIZE,
    FILLER_BIT,
    lifting_index,
    lifting_size_position,
    BaseGraph,
)
from .sch import tbs_calculator, SchSegmentation, sch_segmentation_info, choose_base_graph
from .modulation import Modulation, bits_per_symbol
