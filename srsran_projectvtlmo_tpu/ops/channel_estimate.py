"""Port channel estimation from DM-RS pilots.

Per (port, layer, hop): least-squares estimates at pilot REs, averaged over the
hop's DM-RS symbols, raised-cosine frequency-domain smoothing, noise-variance
estimation from the smoothing residual, time-alignment from the IDFT peak of
the LSE, and interpolation to all subcarriers of the allocation.
reference: lib/phy/upper/signal_processors/port_channel_estimator_average_impl.cpp:39-374.

Everything is batched over a leading axis (cells/UEs) and jit-compiled per
static (nof_rb, symbol set) configuration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cplx import to_cplx, from_cplx

#: Raised-cosine prototype filter: roll-off 0.2, 3-symbol span, 10 samples per
#: symbol (reference: port_channel_estimator_average_impl.cpp:41-46).
RC_FILTER = np.array([
    -0.0641253, -0.0660711, -0.0611526, -0.0485918, -0.0281126, 0.0000000, 0.0348830, 0.0751249,
    0.1188406, 0.1637874, 0.2075139, 0.2475302, 0.2814857, 0.3073415, 0.3235207, 0.3290274,
    0.3235207, 0.3073415, 0.2814857, 0.2475302, 0.2075139, 0.1637874, 0.1188406, 0.0751249,
    0.0348830, 0.0000000, -0.0281126, -0.0485918, -0.0611526, -0.0660711, -0.0641253,
], dtype=np.float32)


@functools.lru_cache(maxsize=None)
def rc_filter(nof_rb: int, stride: int) -> np.ndarray:
    """Resampled, normalized raised-cosine filter for pilots every `stride` REs."""
    nof_rb = min(nof_rb, 3)
    nof_coefs = nof_rb * 10 + 1
    half_out = nof_coefs // 2 // stride
    n_first = len(RC_FILTER) // 2 - half_out * stride
    taps = RC_FILTER[n_first:n_first + (2 * half_out + 1) * stride:stride].copy()
    return (taps / taps.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def estimate_channel_hop(
    rx_pilots_pair,
    ref_pilots_pair,
    nof_rb: int,
    stride: int = 2,
    scs_hz: float = 30e3,
    dmrs_epochs_s: tuple[float, ...] | None = None,
):
    """Estimate one hop's channel for one (port, layer) from its pilots.

    Args:
      rx_pilots_pair: (..., nsym_dmrs, npilots, 2) received pilot REs.
      ref_pilots_pair: (nsym_dmrs, npilots, 2) or (npilots, 2) reference pilots.
      nof_rb: allocation size in RBs.
      stride: pilot spacing in subcarriers (2 for DM-RS type 1).
      dmrs_epochs_s: start times (seconds) of the hop's DM-RS symbols; enables
        exact CFO estimation over non-adjacent DM-RS spacing and CFO
        derotation of the per-symbol LSEs before averaging
        (reference: port_channel_estimator_average_impl.cpp:236-253).

    Returns dict with:
      ce_pair: (..., nsubc, 2) channel estimate on every subcarrier,
      noise_var: (...,) estimated noise variance,
      rsrp: (...,) average pilot power of the estimate,
      epre: (...,) average received pilot energy,
      time_alignment_s: (...,) TA estimate in seconds.
    """
    y = to_cplx(rx_pilots_pair)
    r = to_cplx(ref_pilots_pair)
    if r.ndim < y.ndim - 1:
        r = r[None]

    # LSE per pilot.
    lse_sym = y * jnp.conj(r) / (jnp.abs(r) ** 2)
    nsym = rx_pilots_pair.shape[-3]

    # CFO from the phase drift between the FIRST TWO DM-RS symbols (the
    # reference estimates it from symbols 0/1 only: noisy_phase =
    # arg(dot_prod(products_1, products_0)), then derotates EVERY symbol's
    # products to epoch 0 before averaging
    # (reference: port_channel_estimator_average_impl.cpp:
    # preprocess_pilots_and_cfo, :236-253).
    if nsym >= 2:
        have_epochs = (dmrs_epochs_s is not None and len(dmrs_epochs_s) == nsym)
        if have_epochs:
            epochs = np.asarray(dmrs_epochs_s, np.float32)
        else:
            # Fallback: assume adjacent symbols, one OFDM symbol (~1/scs) apart.
            epochs = np.arange(nsym, dtype=np.float32) / np.float32(scs_hz)
        dt = float(epochs[1] - epochs[0])
        xcorr = jnp.sum(lse_sym[..., 1, :] * jnp.conj(lse_sym[..., 0, :]),
                        axis=-1)
        cfo_hz = jnp.angle(xcorr) / (2.0 * jnp.pi * dt)
        if have_epochs:
            # Derotate per-symbol LSEs to epoch 0 before averaging.
            rot = jnp.exp(-2j * jnp.pi * cfo_hz[..., None] * jnp.asarray(epochs))
            lse_sym = lse_sym * rot[..., None]
    else:
        cfo_hz = jnp.zeros(rx_pilots_pair.shape[:-3], jnp.float32)

    lse = jnp.mean(lse_sym, axis=-2)  # (..., npilots)

    # Raised-cosine smoothing over the pilots enlarged with virtual pilots:
    # linear extrapolation of magnitude and unwrapped phase from the nearest
    # true pilots at each band edge
    # (reference: port_channel_estimator_average_impl.cpp:628-720
    # compute_v_pilots/add_v_pilots; MAX_V_PILOTS=12, all pilots when nof_rb=1).
    taps = jnp.asarray(rc_filter(nof_rb, stride))
    npil_static = lse.shape[-1]
    n_v = min(12, taps.shape[0] // 2)
    if nof_rb == 1:
        n_v = npil_static
    # A linear fit needs >= 2 base pilots; clamp to what the band offers.
    n_v = max(min(n_v, npil_static), 2) if npil_static >= 2 else 0
    enlarged = jnp.concatenate(
        [_virtual_pilots(lse, n_v, True), lse, _virtual_pilots(lse, n_v, False)],
        axis=-1,
    )
    k = taps.shape[0] // 2
    zpad = jnp.zeros(enlarged.shape[:-1] + (k,), enlarged.dtype)
    padded = jnp.concatenate([zpad, enlarged, zpad], axis=-1)
    win = _sliding_windows(padded, taps.shape[0])  # (..., npil + 2 n_v, ntaps)
    smoothed = jnp.einsum("...pt,t->...p", win, taps.astype(jnp.complex64))
    smoothed = smoothed[..., n_v:n_v + npil_static]

    # Noise: residual between per-symbol LSE and the smoothed estimate,
    # floored at 90 dB below the received pilot energy so downstream MMSE /
    # soft-demap scaling stays finite in float32 on noise-free test inputs.
    resid = lse_sym - smoothed[..., None, :]
    npil = lse.shape[-1]
    noise_var = jnp.sum(jnp.abs(resid) ** 2, axis=(-1, -2)) / jnp.maximum(nsym * npil - 1, 1)
    epre_f = jnp.mean(jnp.abs(y) ** 2, axis=(-1, -2))
    noise_var = jnp.maximum(noise_var, 1e-9 * epre_f + 1e-30)

    # Time alignment, reference algorithm
    # (time_alignment_estimator_dft_impl.cpp, DFT_SIZE=4096): place the
    # SMOOTHED pilot estimates at their stride-spaced subcarrier positions
    # of a 4096-point IDFT (the absolute RB offset only contributes a
    # unit-magnitude time modulation, so it is dropped), then compare the
    # strongest |tap| in the first `max_ta` samples (delay) against the
    # strongest in the last `max_ta` (advance).
    nfft = 4096
    pad = jnp.zeros(smoothed.shape[:-1] + (nfft,), smoothed.dtype)
    pad = pad.at[..., 0:npil * stride:stride].set(smoothed)
    imp = jnp.abs(jnp.fft.ifft(pad, axis=-1))
    max_ta = (144 // 2) * nfft // 2048  # 144 samples at rate nfft*scs
    d_mag = imp[..., :max_ta]
    a_mag = imp[..., nfft - max_ta:]
    d_idx = jnp.argmax(d_mag, axis=-1)
    a_idx = jnp.argmax(a_mag, axis=-1)
    d_val = jnp.max(d_mag, axis=-1)
    a_val = jnp.max(a_mag, axis=-1)
    rate = np.float32(nfft) * np.float32(scs_hz)
    ta_s = jnp.where(d_val >= a_val,
                     d_idx.astype(jnp.float32),
                     -(max_ta - a_idx).astype(jnp.float32)) / rate

    # Interpolate the smoothed pilot estimates to all subcarriers.
    nsubc = nof_rb * 12
    pil_pos = jnp.arange(npil, dtype=jnp.float32) * stride  # assumes delta=0 handled by caller
    sub_pos = jnp.arange(nsubc, dtype=jnp.float32)
    ce = _linear_interp(pil_pos, smoothed, sub_pos)

    rsrp = jnp.mean(jnp.abs(smoothed) ** 2, axis=-1)
    epre = jnp.mean(jnp.abs(y) ** 2, axis=(-1, -2))

    return {
        "ce_pair": from_cplx(ce),
        "noise_var": noise_var,
        "rsrp": rsrp,
        "epre": epre,
        "time_alignment_s": ta_s,
        "cfo_hz": cfo_hz,
    }


def _virtual_pilots(lse, n_v: int, is_start: bool):
    """Extrapolated virtual pilots from the n_v nearest true pilots.

    Linear least-squares fit of the pilot magnitude and unwrapped phase over
    local indices 0..n_v-1, evaluated at the n_v indices just outside the band
    (reference: port_channel_estimator_average_impl.cpp:686-720
    compute_v_pilots — identical closed-form slope/intercept).
    """
    base = lse[..., :n_v] if is_start else lse[..., -n_v:]
    mag = jnp.abs(base)
    arg = jnp.unwrap(jnp.angle(base), axis=-1)
    idx = jnp.arange(n_v, dtype=jnp.float32)
    mean_x = (n_v - 1) / 2.0
    norm_x_sq = (n_v - 1) * n_v * (2 * n_v - 1) / 6.0
    denom = norm_x_sq - n_v * mean_x * mean_x

    def fit(y):
        mean_y = jnp.mean(y, axis=-1, keepdims=True)
        slope = (jnp.sum(y * idx, axis=-1, keepdims=True)
                 - mean_x * mean_y * n_v) / denom
        return slope, mean_y - slope * mean_x

    s_abs, i_abs = fit(mag)
    s_arg, i_arg = fit(arg)
    iv = idx + (-n_v if is_start else n_v)
    return ((s_abs * iv + i_abs)
            * jnp.exp(1j * (s_arg * iv + i_arg))).astype(lse.dtype)


def _sliding_windows(x, width: int):
    """(..., n) -> (..., n - width + 1, width) via stacked slices (XLA-friendly)."""
    n = x.shape[-1]
    cols = [x[..., i:n - width + 1 + i] for i in range(width)]
    return jnp.stack(cols, axis=-1)


def _linear_interp(xp, fp, x):
    """Linear interpolation of complex fp(..., np) sampled at xp (np,) onto x
    (nx,), holding the edge values constant outside [xp[0], xp[-1]] (the
    reference repeats the first/last known value instead of extrapolating,
    interpolator_linear_impl.cpp:60-77)."""
    idx = jnp.clip(jnp.searchsorted(xp, x, side="right") - 1, 0, xp.shape[0] - 2)
    x0 = xp[idx]
    x1 = xp[idx + 1]
    w = jnp.clip(((x - x0) / (x1 - x0)).astype(jnp.float32), 0.0, 1.0)
    f0 = fp[..., idx]
    f1 = fp[..., idx + 1]
    return f0 + (f1 - f0) * w


