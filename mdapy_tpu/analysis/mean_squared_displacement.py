"""Mean squared displacement over a trajectory (window/FFT or direct mode).

Parity: reference mean_squared_displacement.py:41-224 — "window" mode uses
the Wiener-Khinchin FFT autocorrelation (MSD(m) = S1(m) - 2 S2(m)); "direct"
computes displacement from frame 0.  Positions must be unwrapped.
"""

from __future__ import annotations

import numpy as np

__all__ = ["MeanSquaredDisplacement"]


class MeanSquaredDisplacement:
    def __init__(self, pos_list: np.ndarray, mode: str = "window"):
        mode = mode.lower()
        if mode not in ("window", "direct"):
            raise ValueError("mode must be 'window' or 'direct'")
        self.pos_list = np.ascontiguousarray(pos_list, dtype=np.float64)
        assert self.pos_list.ndim == 3 and self.pos_list.shape[2] == 3
        self.mode = mode
        self.particle_msd = None
        self.msd = None

    def compute(self):
        pos = self.pos_list
        Nframe = pos.shape[0]
        if self.mode == "direct":
            disp = pos - pos[0:1]
            self.particle_msd = np.sum(disp * disp, axis=2)
        else:
            # Wiener-Khinchin per particle per dimension
            n = Nframe
            nfft = 1 << (2 * n - 1).bit_length()
            # S2 via FFT autocorrelation
            fft = np.fft.rfft(pos, n=nfft, axis=0)
            acf = np.fft.irfft(fft * np.conj(fft), n=nfft, axis=0)[:n].real
            norm = (n - np.arange(n))[:, None, None]
            S2 = acf.sum(axis=2) / norm[..., 0]
            # S1 recursion
            sq = np.sum(pos * pos, axis=2)          # (n, N)
            sumsq = 2.0 * sq.sum(axis=0)            # (N,)
            S1 = np.empty_like(S2)
            run = sumsq.copy()
            for m in range(n):
                if m > 0:
                    run = run - sq[m - 1] - sq[n - m]
                S1[m] = run / (n - m)
            self.particle_msd = S1 - 2.0 * S2
        self.msd = self.particle_msd.mean(axis=1)
        return self

    def plot(self, fig=None, ax=None):
        import matplotlib.pyplot as plt

        if fig is None and ax is None:
            fig, ax = plt.subplots()
        ax.plot(self.msd, "o-")
        ax.set_xlabel("lag frames")
        ax.set_ylabel(r"MSD ($\AA^2$)")
        return fig, ax
