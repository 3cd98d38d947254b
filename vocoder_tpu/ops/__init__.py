from vocoder_tpu.ops.spectral import (  # noqa: F401
    hann_window,
    istft_same,
    linear_spectrogram,
    log_mel_spectrogram,
    mel_filterbank,
    overlap_add,
    stft_magnitude,
    stft_reim,
)
