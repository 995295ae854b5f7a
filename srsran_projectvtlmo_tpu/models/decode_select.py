"""LDPC decoder backend selection for the slot models."""

from ..ops.ldpc.decode import ldpc_decode
from ..ops.ldpc.decode_pallas import ldpc_decode_pallas


def decode_fn(use_pallas: bool):
    if use_pallas:
        return lambda llrs, bg, z, iters: ldpc_decode_pallas(llrs, bg, z, iters)
    return lambda llrs, bg, z, iters: ldpc_decode(llrs, bg, z, nof_iterations=iters)
