"""Device mesh + GSPMD sharding rules.

The reference's only parallelism is Lightning DDP over NCCL (SURVEY.md §2.10,
configs/trainer/default.yaml:9).  Here the equivalent — and more — is a
`jax.sharding.Mesh(("data", "model"))`:

- data axis: batch sharding; gradient allreduce becomes a GSPMD-inserted psum
  riding ICI within a slice (DCN across hosts) — no hand-written collectives.
- model axis: channel sharding of the largest generators (vocos-huge,
  BigVGAN-base), the BASELINE.md north-star capability the reference lacks.

Everything is plain NamedSharding over pjit/jit — one program, any mesh size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh.  data defaults to n_devices // model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over "data"; audio batches are (B, 1, T)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def infer_param_specs(params, mesh: Mesh, min_size: int = 1 << 16):
    """Channel-sharding rule for the "model" axis.

    For each weight leaf, shard the largest axis that is divisible by the
    model-axis size, preferring the output-channel (last) axis; small leaves
    replicate.  With model=1 everything replicates (pure DP).  GSPMD inserts
    the needed all-gathers/psums; layout stays channels-last so the sharded
    axis is the TPU lane dim.
    """
    m = mesh.shape["model"]

    def spec_for(leaf):
        if m == 1 or leaf.ndim == 0 or leaf.size < min_size:
            return P()
        # Prefer the last axis (output channels / lane dim).
        order = [leaf.ndim - 1] + list(range(leaf.ndim - 1))
        for ax in order:
            if leaf.shape[ax] % m == 0 and leaf.shape[ax] // m >= 8:
                spec = [None] * leaf.ndim
                spec[ax] = "model"
                return P(*spec)
        return P()

    return jax.tree.map(lambda leaf: NamedSharding(mesh, spec_for(leaf)), params)


def shard_train_state(state, mesh: Mesh):
    """Place a whole TrainState on the mesh.

    The same per-leaf rule covers params AND their optax moment buffers (they
    mirror the param tree leaf-for-leaf), so Adam states shard alongside their
    weights; scalars/counters replicate.
    """
    shardings = infer_param_specs(state, mesh)
    return jax.tree.map(jax.device_put, state, shardings)
