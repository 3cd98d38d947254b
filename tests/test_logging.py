"""MetricsLogger fan-out tests.

The W&B path is exercised with a stub module (the real package needs network
egress and is absent here): scalars, audio, and figures must all reach the
active run, matching the reference's logger fan-out
(fish_vocoder/models/vocoder.py:80-116).
"""

import sys
import types

import numpy as np


class _StubRun:
    def __init__(self):
        self.logged = []

    def log(self, payload, step=None):
        self.logged.append((step, payload))


def _install_stub_wandb(monkeypatch):
    mod = types.ModuleType("wandb")

    class Audio:
        def __init__(self, data, sample_rate):
            self.data = np.asarray(data)
            self.sample_rate = sample_rate

    class Image:
        def __init__(self, fig):
            self.fig = fig

    mod.Audio = Audio
    mod.Image = Image
    mod.init = lambda **kw: _StubRun()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_wandb_media_fanout(tmp_path, monkeypatch):
    mod = _install_stub_wandb(monkeypatch)
    from vocoder_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(tmp_path, use_tensorboard=False, use_wandb=True)
    assert isinstance(logger.wandb, _StubRun)

    logger.write(3, {"train/loss": 1.5})
    logger.add_audio(3, "val/audio_0", np.zeros(800, np.float32), 8000)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot([0, 1])
    logger.add_figure(3, "val/mel_0", fig)
    logger.close()

    kinds = {}
    for step, payload in logger.wandb.logged:
        assert step == 3
        for k, v in payload.items():
            kinds[k] = type(v).__name__
    assert kinds.get("train/loss") == "float"
    assert kinds.get("val/audio_0") == "Audio"
    assert kinds.get("val/mel_0") == "Image"
    # the durable PNG record is written regardless of the logger backends
    assert list((tmp_path / "media").glob("val_mel_0_*.png"))
    del mod


def test_logger_without_wandb_still_writes_jsonl(tmp_path):
    from vocoder_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(tmp_path, use_tensorboard=False, use_wandb=False)
    logger.write(1, {"a": 2.0})
    logger.close()
    assert (tmp_path / "metrics.jsonl").read_text().strip().endswith('"a": 2.0}')
