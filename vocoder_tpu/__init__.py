"""vocoder_tpu — a TPU-native neural vocoder framework (JAX/XLA/Pallas).

Brand-new implementation with the capability surface of fishaudio/vocoder
(reference mounted read-only at /root/reference), designed TPU-first:

- Spectral feature extraction (STFT -> log-mel) runs on-device as MXU-friendly
  convolutions against a windowed DFT basis, so the input pipeline feeds raw
  audio only (reference keeps features on-device too, see
  fish_vocoder/configs/model/gan.yaml:31-36).
- Models are pure functions over parameter pytrees (init/apply), jit-compiled
  end to end; the GAN train step (G update then D update) is ONE fused jit
  program with two optax optimizer chains.
- Scaling uses jax.sharding.Mesh + NamedSharding (GSPMD): data-parallel batch
  sharding with gradient psum over ICI, optional channel sharding ("model"
  axis) for the largest generators.
"""

__version__ = "0.1.0"
