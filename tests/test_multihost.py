"""True multi-process distributed training test (2 'hosts' on localhost).

The reference cannot test its DDP path without a GPU cluster; here two
separate processes join via jax.distributed over a local coordinator, each
contributes its per-host shard of the global batch
(jax.make_array_from_process_local_data — the DevicePrefetcher multihost
path), and the fused GAN train step runs with GSPMD collectives between them.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 fake devices per process

    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.getcwd())
    from tests.test_gan_step import tiny_cfg
    from vocoder_tpu.parallel import batch_sharding, make_mesh
    from vocoder_tpu.train import gan

    cfg = tiny_cfg()
    mesh = make_mesh(data=4, model=1)
    state = gan.create_train_state_sharded(jax.random.key(0), cfg, mesh)

    t = cfg.hop_length * cfg.num_frames
    rng = np.random.default_rng(proc_id)
    local = {
        "audio": np.asarray(rng.standard_normal((2, 1, t)) * 0.3, np.float32),
        "lengths": np.full((2,), t, np.int64),
    }
    sharding = batch_sharding(mesh)
    batch = {k: jax.make_array_from_process_local_data(sharding, v) for k, v in local.items()}

    step = jax.jit(gan.make_train_step(cfg), donate_argnums=0)
    state, metrics = step(state, batch)
    g = float(metrics["train/generator/all"])
    d = float(metrics["train/discriminator/all"])
    assert np.isfinite(g) and np.isfinite(d), (g, d)
    print(f"proc{proc_id} ok g={g:.4f} d={d:.4f}", flush=True)
    """
)


def test_two_process_distributed_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd="/root/repo",
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
        assert f"proc{i} ok" in out
    # Both processes computed the SAME global loss (collectives agree).
    g0 = [line for line in outs[0].splitlines() if "ok g=" in line][0].split("g=")[1]
    g1 = [line for line in outs[1].splitlines() if "ok g=" in line][0].split("g=")[1]
    assert g0 == g1, (g0, g1)
