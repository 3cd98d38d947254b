"""SSL feature encoders (HuBERT / MMS wav2vec2) for semantic->wav codecs.

Capability parity with /root/reference/fish_vocoder/modules/encoders/
{hubert.py:6-51, mms.py:7-33}: a frozen transformer SSL backbone producing
features from raw 16 kHz audio, plus (HuBERT path) a trainable stride-2 conv
post-net.  The MMS variant resamples input to 16 kHz and nearest-interpolates
features back to T/hop frames (mms.py:16-33).

TPU-split design: the FROZEN backbone runs host-side through the torch CPU
build of `transformers` (it is frozen by default in the reference,
hubert.py:14-16 — i.e. a fixed feature extractor, naturally part of the input
pipeline), while the trainable post-net is a JAX conv that joins the jitted
train step.  This environment has no network egress, so pretrained weights
load only from a local path; otherwise the backbone is built from its config
with random weights (clearly logged) — sufficient for wiring/shape tests.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from vocoder_tpu import nn
from vocoder_tpu.data.resample import resample
from vocoder_tpu.utils.logging import log


@dataclasses.dataclass(frozen=True)
class HubertEncoderConfig:
    model_name_or_path: str = "facebook/hubert-base-ls960"
    freeze_backbone: bool = True
    output_size: int = 512
    hidden_size: int = 768  # backbone hidden (for post-net input dim)


class HubertFeatureExtractor:
    """Host-side frozen HuBERT features: audio (B, T16k) -> (B, T', hidden)."""

    def __init__(self, cfg: HubertEncoderConfig):
        import torch
        from transformers import HubertConfig, HubertModel

        self.torch = torch
        try:
            self.model = HubertModel.from_pretrained(cfg.model_name_or_path)
        except Exception:
            log(
                f"hubert: cannot load pretrained weights from {cfg.model_name_or_path!r} "
                "(no network egress?) — building random-weight backbone from config"
            )
            self.model = HubertModel(HubertConfig(hidden_size=cfg.hidden_size))
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad = False

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        with self.torch.no_grad():
            out = self.model(self.torch.from_numpy(np.asarray(audio, np.float32)))
        return out.last_hidden_state.numpy()  # (B, T', hidden)


def hubert_postnet_init(key, cfg: HubertEncoderConfig) -> dict:
    """The trainable post-net (hubert.py:22-30): Conv1d(hidden, out, k3, p1)
    -> SiLU -> Conv1d(out, out, k3, s2, p1) -> SiLU -> Conv1d(out, out, k1)."""
    import jax

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "post0": nn.conv1d_init(k1, cfg.hidden_size, cfg.output_size, 3),
        "post1": nn.conv1d_init(k2, cfg.output_size, cfg.output_size, 3),
        "post2": nn.conv1d_init(k3, cfg.output_size, cfg.output_size, 1),
    }


def hubert_postnet_apply(params: dict, features) -> "jnp.ndarray":
    """features (B, T', hidden) channels-last -> (B, ceil(T'/2), output_size)."""
    x = nn.silu(nn.conv1d(params["post0"], features, padding=1))
    x = nn.silu(nn.conv1d(params["post1"], x, stride=2, padding=1))
    return nn.conv1d(params["post2"], x)


@dataclasses.dataclass(frozen=True)
class MMSEncoderConfig:
    model_name_or_path: str = "facebook/mms-300m"
    hop_length: int = 512
    sampling_rate: int = 44100
    hidden_size: int = 1024


class MMSFeatureExtractor:
    """Host-side frozen MMS/wav2vec2 features aligned to T/hop frames (mms.py:16-33)."""

    def __init__(self, cfg: MMSEncoderConfig):
        import torch
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        self.cfg = cfg
        self.torch = torch
        try:
            self.model = Wav2Vec2Model.from_pretrained(cfg.model_name_or_path)
        except Exception:
            log(
                f"mms: cannot load pretrained weights from {cfg.model_name_or_path!r} — "
                "building random-weight backbone from config"
            )
            self.model = Wav2Vec2Model(Wav2Vec2Config(hidden_size=cfg.hidden_size))
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad = False

    def __call__(self, audio: np.ndarray) -> np.ndarray:
        """audio (B, T) at cfg.sampling_rate -> (B, hidden, T//hop)."""
        t = audio.shape[-1]
        n_frames = t // self.cfg.hop_length
        audio16 = resample(audio, self.cfg.sampling_rate, 16000)
        with self.torch.no_grad():
            feats = self.model(self.torch.from_numpy(np.asarray(audio16, np.float32))).last_hidden_state
        feats = feats.transpose(1, 2)  # (B, hidden, T')
        # Nearest interpolation to n_frames (mms.py:30-32).
        src = np.clip(
            np.floor(np.arange(n_frames) * feats.shape[-1] / n_frames).astype(np.int64),
            0,
            feats.shape[-1] - 1,
        )
        return feats[:, :, src].numpy()
