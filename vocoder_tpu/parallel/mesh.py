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


def _heuristic_spec(leaf, mesh: Mesh, min_size: int = 1 << 16) -> P:
    """Fallback channel-sharding rule for one leaf: shard the largest axis
    divisible by the model-axis size, preferring the output-channel (last)
    axis — the TPU lane dim in channels-last layout; small leaves replicate."""
    m = mesh.shape["model"]
    if m == 1 or leaf.ndim == 0 or leaf.size < min_size:
        return P()
    order = [leaf.ndim - 1] + list(range(leaf.ndim - 1))
    for ax in order:
        if leaf.shape[ax] % m == 0 and leaf.shape[ax] // m >= 8:
            spec = [None] * leaf.ndim
            spec[ax] = "model"
            return P(*spec)
    return P()


def infer_param_specs(params, mesh: Mesh, min_size: int = 1 << 16):
    """Heuristic channel-sharding for the "model" axis over a whole tree.

    With model=1 everything replicates (pure DP).  GSPMD inserts the needed
    all-gathers/psums.  Models with a `param_specs` entry in the registry get
    EXPLICIT Megatron-style specs instead (see train_state_specs), because the
    per-leaf heuristic cannot know that e.g. a row-parallel matmul must shard
    its INPUT axis to avoid re-gathering activations.
    """
    return jax.tree.map(lambda leaf: NamedSharding(mesh, _heuristic_spec(leaf, mesh, min_size)), params)


def _spec_fits(spec: P, shape: tuple, mesh: Mesh) -> bool:
    for d, ax in enumerate(spec):
        if ax is None:
            continue
        names = (ax,) if isinstance(ax, str) else tuple(ax)
        size = int(np.prod([mesh.shape[n] for n in names]))
        if d >= len(shape) or shape[d] % size != 0:
            return False
    return True


def train_state_specs(abstract_state, mesh: Mesh, gen_specs=None):
    """NamedSharding tree for a whole TrainState.

    When the generator provides explicit PartitionSpecs (`gen_specs`, a tree
    mirroring gen_params), those specs are applied to gen_params AND — via
    longest-path-suffix matching — to every optimizer-moment copy of the same
    leaves (adam mu/nu inside opt_g mirror the param tree path-for-path).
    Everything else (discriminators, their moments, counters) falls back to
    the per-leaf heuristic.
    """
    if gen_specs is None:
        return infer_param_specs(abstract_state, mesh)
    from jax.tree_util import tree_flatten_with_path, tree_map_with_path

    flat, _ = tree_flatten_with_path(gen_specs, is_leaf=lambda x: isinstance(x, P))
    norm = lambda path: tuple(str(k) for k in path)
    table = {norm(p): s for p, s in flat}

    def pick(path, leaf):
        p = norm(path)
        for i in range(len(p)):  # longest suffix first
            spec = table.get(p[i:])
            if spec is not None:
                if not _spec_fits(spec, leaf.shape, mesh):
                    spec = _heuristic_spec(leaf, mesh)
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, _heuristic_spec(leaf, mesh))

    return tree_map_with_path(pick, abstract_state)


def constrain(x: jnp.ndarray, *spec):
    """`with_sharding_constraint` against the ambient `with mesh:` context.

    Model code calls this unconditionally; outside any mesh (single-chip
    inference, CPU tests) it is a no-op, and axes missing from the ambient
    mesh or not dividing the dimension are dropped.  This is how backbone
    activations pin their layout (e.g. MLP hidden sharded over "model") so
    GSPMD cannot degrade to replicate-and-all-gather.
    """
    try:
        from jax._src.mesh import thread_resources

        mesh = thread_resources.env.physical_mesh
    except Exception:
        return x
    if mesh.empty:
        return x
    fixed = []
    for d, ax in enumerate(spec):
        ok = (
            ax is not None
            and ax in mesh.axis_names
            and d < x.ndim
            and x.shape[d] % mesh.shape[ax] == 0
        )
        fixed.append(ax if ok else None)
    if not any(a is not None for a in fixed):
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*fixed)))


def shard_channels(x: jnp.ndarray, wide: bool = True):
    """Pin (B, ..., C) activations to P("data", ..., "model") when the stage
    is wide enough to tensor-shard (`wide`), else P("data", ...).

    The upsampling generators (HiFiGAN/BigVGAN) use this with
    wide = (C >= 128 and unfolded): wide stages carry channel-sharded
    activations end to end (every conv is row-parallel over its input axis,
    GSPMD reduce-scatters its output back to sharded), while the narrow
    time-folded tail stages stay model-replicated — exactly the stages whose
    weights param_specs replicates.  No-op without an ambient mesh.
    """
    if wide and x.ndim >= 2:
        return constrain(x, *(["data"] + [None] * (x.ndim - 2) + ["model"]))
    return constrain(x, "data")


def shard_train_state(state, mesh: Mesh, gen_specs=None):
    """Place a whole TrainState on the mesh.

    The per-leaf rule (or the generator's explicit specs, see
    train_state_specs) covers params AND their optax moment buffers (they
    mirror the param tree leaf-for-leaf), so Adam states shard alongside their
    weights; scalars/counters replicate.
    """
    shardings = train_state_specs(state, mesh, gen_specs)
    return jax.tree.map(jax.device_put, state, shardings)
