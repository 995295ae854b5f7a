"""LDPC decoder backend selection for the slot models.

The delta-roll v3 Pallas kernel is the production TPU path: it stores each
column's soft bits in the check domain of the last row that touched them so
every edge costs one lane rotation instead of two (measured 1.51 ms vs
1.58 ms per 64-codeblock call at z=384/6it; all calls are dominated by the
~1.3 ms remote-dispatch floor, so batch size is the real throughput lever).
v1 (roll-pair) and the compile-light looped v2 remain as fallbacks; the XLA
scan decoder serves CPU tests and small Z.  All variants are bit-exact
against each other and the reference C++ (tests/test_reference_parity.py).
"""

from ..ops.ldpc.decode import ldpc_decode
from ..ops.ldpc.decode_pallas import ldpc_decode_pallas, ldpc_decode_pallas_v3
from ..ops.ldpc.decode_pallas_v2 import ldpc_decode_pallas_v2

_PALLAS = {
    "v1": ldpc_decode_pallas,
    "v2": ldpc_decode_pallas_v2,
    "v3": ldpc_decode_pallas_v3,
}


def decode_fn(use_pallas: bool, variant: str = "v3"):
    if use_pallas:
        kern = _PALLAS[variant]
        return lambda llrs, bg, z, iters: kern(llrs, bg, z, iters)
    return lambda llrs, bg, z, iters: ldpc_decode(llrs, bg, z, nof_iterations=iters)
