"""LDPC decoder backend selection for the slot models.

The v2 (compile-light) Pallas kernel is the production TPU path: the unrolled
v1 kernel and the XLA scan decoder both hit pathological compile times at
large lifting sizes on the remote-compile tunnel.
"""

from ..ops.ldpc.decode import ldpc_decode
from ..ops.ldpc.decode_pallas_v2 import ldpc_decode_pallas_v2


def decode_fn(use_pallas: bool):
    if use_pallas:
        return lambda llrs, bg, z, iters: ldpc_decode_pallas_v2(llrs, bg, z, iters)
    return lambda llrs, bg, z, iters: ldpc_decode(llrs, bg, z, nof_iterations=iters)
