"""Pseudo-QMF filter bank (near-perfect-reconstruction, Kaiser prototype).

Behavioral reference: /root/reference/Avocodo.py:421-548. Filter design is
host-side numpy (scipy kaiser window); analysis/synthesis run on device as
1-D convs. Channels-last: audio [B, T, 1] -> subbands [B, T//N, N].
"""

from __future__ import annotations

import functools

import numpy as np
import scipy.signal
import jax
import jax.numpy as jnp


def design_prototype_filter(
    taps: int = 62, cutoff_ratio: float = 0.142, beta: float = 9.0
) -> np.ndarray:
    """Kaiser-window lowpass prototype (reference Avocodo.py:421-452)."""
    assert taps % 2 == 0
    assert 0.0 < cutoff_ratio < 1.0
    omega_c = np.pi * cutoff_ratio
    n = np.arange(taps + 1) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_i = np.sin(omega_c * n) / (np.pi * n)
    h_i[taps // 2] = cutoff_ratio
    w = scipy.signal.windows.kaiser(taps + 1, beta)
    return h_i * w


@functools.lru_cache(maxsize=None)
def _pqmf_filters(subbands: int, taps: int, cutoff_ratio: float, beta: float):
    h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
    n = np.arange(taps + 1) - taps / 2
    k = np.arange(subbands)[:, None]
    phase = (2 * k + 1) * (np.pi / (2 * subbands)) * n[None, :]
    h_analysis = 2 * h_proto[None, :] * np.cos(phase + (-1.0) ** k * np.pi / 4)
    h_synthesis = 2 * h_proto[None, :] * np.cos(phase - (-1.0) ** k * np.pi / 4)
    return h_analysis.astype(np.float32), h_synthesis.astype(np.float32)


class PQMF:
    """Analysis/synthesis filter bank (reference Avocodo.py:455-548).

    The reference's strided identity up/down conv (updown_filter) reduces to
    plain subsampling / zero-stuffing — done directly here.
    """

    def __init__(
        self,
        subbands: int = 4,
        taps: int = 62,
        cutoff_ratio: float = 0.142,
        beta: float = 9.0,
    ):
        self.subbands = subbands
        self.taps = taps
        h_a, h_s = _pqmf_filters(subbands, taps, cutoff_ratio, beta)
        # channels-last conv kernels: [k, in, out]
        self.analysis_filter = jnp.asarray(h_a.T[:, None, :])  # [taps+1, 1, N]
        self.synthesis_filter = jnp.asarray(h_s.T[:, :, None])  # [taps+1, N, 1]

    def analysis(self, x: jax.Array) -> jax.Array:
        """[B, T, 1] -> [B, T//N, N]."""
        pad = self.taps // 2
        y = jax.lax.conv_general_dilated(
            x,
            self.analysis_filter.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y[:, :: self.subbands, :]

    def synthesis(self, x: jax.Array) -> jax.Array:
        """[B, T//N, N] -> [B, T, 1]."""
        b, t, n = x.shape
        up = jnp.zeros((b, t * n, n), x.dtype)
        up = up.at[:, ::n, :].set(x * n)
        pad = self.taps // 2
        return jax.lax.conv_general_dilated(
            up,
            self.synthesis_filter.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
