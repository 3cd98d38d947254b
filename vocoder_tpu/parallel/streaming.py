"""Long-utterance inference: overlap-chunked synthesis (optionally sharded).

The reference streams arbitrary-length files through in one pass (test.py) —
fine on one GPU, but a single XLA program with unbounded T causes recompiles
and can exceed HBM.  SURVEY.md §5.7 names the TPU answer: static bucketed
shapes + time-axis splitting.  Because every generator here is fully
convolutional with a finite receptive field, chunking the mel with an overlap
of >= the receptive field and trimming the halo yields EXACTLY the full-pass
waveform in the interior — and the chunk batch can be sharded over the
"data" mesh axis so one utterance fans out across chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def chunked_synthesis(
    apply_fn,
    mel: jnp.ndarray,
    *,
    hop_length: int,
    chunk_frames: int = 512,
    overlap_frames: int = 32,
    sharding=None,
) -> jnp.ndarray:
    """mel (1, C, T) -> audio (1, 1, T*hop), one fixed-shape program per chunk size.

    overlap_frames must cover the generator's receptive field in mel frames
    (HiFiGAN base: ~13 frames; 32 is conservative; BigVGAN's anti-aliased
    stack needs a few more).
    """
    b, c, t = mel.shape
    assert b == 1, "chunked_synthesis is per-utterance; batch full clips instead"
    if t <= chunk_frames:
        return apply_fn(mel)

    core = chunk_frames - 2 * overlap_frames
    assert core > 0, (chunk_frames, overlap_frames)
    n_chunks = int(np.ceil(t / core))
    right = n_chunks * core + overlap_frames - t
    mel_p = jnp.pad(mel, ((0, 0), (0, 0), (overlap_frames, right)), mode="edge")

    starts = [i * core for i in range(n_chunks)]
    chunks = jnp.stack([jax.lax.dynamic_slice_in_dim(mel_p[0], s, chunk_frames, axis=1) for s in starts])
    if sharding is not None:
        chunks = jax.device_put(chunks, sharding)

    audio_chunks = apply_fn(chunks)  # (n_chunks, 1, chunk_frames*hop)
    lo = overlap_frames * hop_length
    hi = lo + core * hop_length
    core_audio = audio_chunks[:, 0, lo:hi].reshape(1, 1, -1)
    return core_audio[:, :, : t * hop_length]
