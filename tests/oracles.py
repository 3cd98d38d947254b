"""Shared torch oracles used across parity tests."""

import torch
import torch.nn.functional as F


def vocos_istft_same(S: torch.Tensor, n_fft: int, hop: int, win: int) -> torch.Tensor:
    """Oracle for vocos.spectral_ops.ISTFT(padding='same') (fold-based OLA)."""
    window = torch.hann_window(win, dtype=S.real.dtype)
    pad = (win - hop) // 2
    B, N, T = S.shape
    ifft = torch.fft.irfft(S, n_fft, dim=1, norm="backward")
    ifft = ifft * window[None, :, None]
    output_size = (T - 1) * hop + win
    y = F.fold(ifft, output_size=(1, output_size), kernel_size=(1, win), stride=(1, hop))[
        :, 0, 0, pad:-pad
    ]
    window_sq = window.square().expand(1, T, -1).transpose(1, 2)
    env = F.fold(
        window_sq, output_size=(1, output_size), kernel_size=(1, win), stride=(1, hop)
    ).squeeze()[pad:-pad]
    assert (env > 1e-11).all()
    return y / env


class TorchISTFTHead(torch.nn.Module):
    """Oracle mirroring the reference ISTFTHead (modules/generators/vocos.py:6-69)."""

    def __init__(self, dim, n_fft, hop_length, win_length):
        super().__init__()
        self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
        self.out = torch.nn.Conv1d(dim, n_fft * 2, 1)

    def forward(self, x):
        x = self.out(x)
        mag, p = x.chunk(2, dim=1)
        mag = torch.clip(torch.exp(mag), max=1e2)
        S = mag * (torch.cos(p) + 1j * torch.sin(p))
        return vocos_istft_same(S, self.n_fft, self.hop, self.win)
