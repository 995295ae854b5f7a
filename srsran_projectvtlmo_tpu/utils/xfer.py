"""Device->host transfer with retry.

The target runtime's device tunnel intermittently fails transfers of freshly
produced program outputs with `UNIMPLEMENTED: TPU backend error`; a short retry
resolves it.  All host-side consumers of device results go through to_host().
"""

from __future__ import annotations

import time

import numpy as np


def to_host(x, retries: int = 3, delay_s: float = 1.0) -> np.ndarray:
    last = None
    for attempt in range(retries + 1):
        try:
            return np.asarray(x)
        except Exception as e:  # jax.errors.JaxRuntimeError
            last = e
            if "UNIMPLEMENTED" not in str(e) or attempt == retries:
                raise
            time.sleep(delay_s * (attempt + 1))
    raise last
