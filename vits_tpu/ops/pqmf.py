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
        # Polyphase analysis kernel [J, N, N] (block j, phase r, subband k):
        # W[j, r, k] = h_a[k, j*N + r].  The naive form — stride-1 conv with a
        # 1-input-channel (taps+1)-tap kernel, then [::N] — computes N x more
        # outputs than kept AND maps terribly onto the MXU (1 channel can't
        # fill the systolic array; it was the single hottest fusion in the
        # train-step trace at ~6 ms/step for the SBD's 16-band/257-tap bank).
        # Folding the decimation into a polyphase block reshape turns it into
        # a dense N-in/N-out conv over T/N frames: same numbers, N x fewer
        # FLOPs, MXU-shaped.
        K = taps + 1
        J = -(-K // subbands)
        h_pad = np.zeros((subbands, J * subbands), np.float32)
        h_pad[:, :K] = h_a
        self.poly_analysis = jnp.asarray(
            h_pad.reshape(subbands, J, subbands).transpose(1, 2, 0)
        )
        self._poly_J = J

    def analysis(self, x: jax.Array) -> jax.Array:
        """[B, T, 1] -> [B, ceil(T/N), N] — polyphase decimating filterbank.

        Identical numerics to conv(pad=taps//2)[::N] (reference
        Avocodo.py:497-508): output i equals sum_u h[u] * x_pad[i*N + u].
        """
        b, t, _ = x.shape
        n, p, J = self.subbands, self.taps // 2, self._poly_J
        frames = -(-t // n)
        total = (frames + J - 1) * n  # padded length covering every window
        assert total >= t + p, (t, n, p, J)
        xp = jnp.pad(x[:, :, 0], ((0, 0), (p, total - t - p)))
        blocks = xp.reshape(b, frames + J - 1, n)  # X[m, r] = x_pad[m*N + r]
        y = jax.lax.conv_general_dilated(
            blocks,
            self.poly_analysis.astype(x.dtype),
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y

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
