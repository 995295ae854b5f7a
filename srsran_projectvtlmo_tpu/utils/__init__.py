from .llr import LLR_MAX, LLR_INFTY, llr_quantize, llr_saturating_add, llr_promotion_sum, llr_to_hard_bit
from .bits import pack_bits, unpack_bits
