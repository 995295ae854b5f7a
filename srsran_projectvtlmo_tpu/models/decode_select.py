"""LDPC decoder backend selection for the slot models.

The unrolled v1 Pallas kernel is the production TPU path (fastest steady
state: 1.68 ms/32 CBs at z=384/6it vs 2.50 ms for the looped v2; both compile
in seconds when the remote compiler cooperates).  v2 remains the
compile-light fallback; the XLA scan decoder serves CPU tests and small Z.
"""

from ..ops.ldpc.decode import ldpc_decode
from ..ops.ldpc.decode_pallas import ldpc_decode_pallas
from ..ops.ldpc.decode_pallas_v2 import ldpc_decode_pallas_v2


def decode_fn(use_pallas: bool, variant: str = "v1"):
    if use_pallas:
        kern = ldpc_decode_pallas if variant == "v1" else ldpc_decode_pallas_v2
        return lambda llrs, bg, z, iters: kern(llrs, bg, z, iters)
    return lambda llrs, bg, z, iters: ldpc_decode(llrs, bg, z, nof_iterations=iters)
