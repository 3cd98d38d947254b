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


# ---------------------------------------------------------------------------
# alias_free_torch oracle (the package is absent; reimplemented from its
# public algorithm so the reference BigVGAN module can be imported and used
# as a full-generator parity oracle).
# ---------------------------------------------------------------------------


def _kaiser_sinc_filter1d(cutoff, half_width, kernel_size):
    import math

    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if even:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    if cutoff == 0:
        return torch.zeros(1, 1, kernel_size)
    f = 2 * cutoff * window * torch.special.sinc(2 * cutoff * time)
    f = f / f.sum()
    return f.view(1, 1, kernel_size)


class TorchUpSample1d(torch.nn.Module):
    def __init__(self, ratio=2, kernel_size=None):
        super().__init__()
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        self.stride = ratio
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride + (self.kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride + (self.kernel_size - self.stride + 1) // 2
        self.register_buffer(
            "filter", _kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size)
        )

    def forward(self, x):
        c = x.shape[1]
        x = F.pad(x, (self.pad, self.pad), mode="replicate")
        x = self.ratio * F.conv_transpose1d(
            x, self.filter.expand(c, -1, -1), stride=self.stride, groups=c
        )
        return x[..., self.pad_left : -self.pad_right]


class TorchDownSample1d(torch.nn.Module):
    def __init__(self, ratio=2, kernel_size=None):
        super().__init__()
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        even = self.kernel_size % 2 == 0
        self.pad_left = self.kernel_size // 2 - int(even)
        self.pad_right = self.kernel_size // 2
        self.register_buffer(
            "filter", _kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, self.kernel_size)
        )

    def forward(self, x):
        c = x.shape[1]
        x = F.pad(x, (self.pad_left, self.pad_right), mode="replicate")
        return F.conv1d(x, self.filter.expand(c, -1, -1), stride=self.ratio, groups=c)


class TorchActivation1d(torch.nn.Module):
    def __init__(self, activation, up_ratio=2, down_ratio=2, up_kernel_size=12, down_kernel_size=12):
        super().__init__()
        # attribute named `activation` to match the real package's state_dict keys
        self.activation = activation
        self.upsample = TorchUpSample1d(up_ratio, up_kernel_size)
        self.downsample = TorchDownSample1d(down_ratio, down_kernel_size)

    def forward(self, x):
        return self.downsample(self.activation(self.upsample(x)))


def install_fake_alias_free_torch():
    """Register a stand-in `alias_free_torch` so reference bigvgan.py imports."""
    import sys
    import types

    if "alias_free_torch" in sys.modules:
        return
    mod = types.ModuleType("alias_free_torch")
    mod.Activation1d = TorchActivation1d
    sys.modules["alias_free_torch"] = mod
