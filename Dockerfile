# vocoder_tpu runtime environment — TPU VM image spec.
#
# Functional equivalent of the reference's pinned container
# (/root/reference/dockerfile:1-27: CUDA base + ffmpeg + s5cmd); here the
# base is a plain Debian/Ubuntu python image plus libtpu-enabled JAX, and the
# system codecs the ctypes audio bindings require are pinned EXPLICITLY —
# without libmpg123/libmp3lame/libvorbisfile installed, mp3/ogg silently drop
# out of DECODABLE_EXTENSIONS (vocoder_tpu/data/mp3.py, data/ogg.py) and
# corpora containing them fail fast at dataset construction.
#
# Versions below are the ones this framework was built and benchmarked
# against (TPU v5e, 2026-08): python 3.12, jax 0.9.0, flax 0.12.3,
# optax 0.2.6, orbax-checkpoint (bundled with jax release), numpy 2.0.2.

FROM python:3.12-slim-bookworm

ENV DEBIAN_FRONTEND=noninteractive
# System codecs (REQUIRED for mp3/ogg corpora — see header), toolchain for
# native/audio_kernels.cc, git for source installs.
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ make git \
        libmpg123-0 libmp3lame0 libvorbis0a libvorbisenc2 libvorbisfile3 libogg0 \
    && apt-get clean && rm -rf /var/lib/apt/lists/*

# JAX with TPU support (pulls the matching libtpu); pinned to the
# benchmarked versions.  On a GPU/CPU box swap the extra for jax[cpu].
RUN pip install --no-cache-dir \
        "jax[tpu]==0.9.0" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        "flax==0.12.3" "optax==0.2.6" "orbax-checkpoint" "numpy==2.0.2" \
        "einops" "pytest"

# Optional extras: torch (CPU) only for reference-checkpoint import and
# parity tests; the ITU PESQ C extension for absolute-conformance eval
# (vocoder_tpu/pesq_native.py prefers it when importable).
RUN pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu || true
RUN pip install --no-cache-dir pesq tensorboardX matplotlib || true

WORKDIR /opt/vocoder_tpu
COPY pyproject.toml .
COPY vocoder_tpu/ vocoder_tpu/
COPY native/ native/
COPY scripts/ scripts/
COPY tests/ tests/

# Build the native audio kernels (FLAC decode + polyphase resample C++ path;
# the pure-Python oracles remain as fallback if this step is skipped).
RUN make -C native

RUN pip install --no-cache-dir -e .

# Sanity: every decodable extension registers, the native kernel loads.
RUN python -c "from vocoder_tpu.data.audio_io import DECODABLE_EXTENSIONS as D; \
    assert {'.wav', '.flac', '.mp3', '.ogg'} <= set(D), D; print('codecs ok:', sorted(D))"

CMD ["python", "-m", "vocoder_tpu.cli.train", "--help"]
