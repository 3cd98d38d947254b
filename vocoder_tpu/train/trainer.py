"""Training loop: explicit jit-compiled step loop (no framework inversion).

The reference inverts control into Lightning's Trainer (SURVEY.md §1); here
the loop is ~100 lines of explicit code: sharded data prefetch, one donated
jit train step, rank-zero logging, periodic validation (every 5000 steps) and
Orbax checkpointing (every 20000 steps, keep all) with auto-resume — the same
cadence as configs/trainer/default.yaml:16 + callbacks/default.yaml:8-17.
"""

from __future__ import annotations

import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vocoder_tpu import nn
from vocoder_tpu.config import TrainConfig
from vocoder_tpu.data import transforms as T
from vocoder_tpu.data.dataset import DevicePrefetcher, MixDataset, VocoderDataset, batch_iterator
from vocoder_tpu.parallel import batch_sharding, make_mesh, shard_train_state
from vocoder_tpu.train import gan
from vocoder_tpu.utils.checkpoint import CheckpointManager, abstract_like
from vocoder_tpu.utils.logging import MetricsLogger, log
from vocoder_tpu.utils.viz import plot_mel


def maybe_init_distributed() -> None:
    """Multi-host init (jax.distributed): the NCCL/DDP analogue, SURVEY.md §5.8.

    Must run BEFORE anything touches a backend: `jax.process_count()` (or any
    device query) initialises the backends, after which
    `jax.distributed.initialize()` is a no-op/error and the pod silently runs
    as N singletons.  So the guard here only inspects env vars and the
    distributed global state — never the backend.
    """
    if not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return
    try:
        # Private API, best-effort: the already-initialised check avoids a
        # noisy re-init error, but a jax upgrade removing it must not break
        # startup — fall through to initialize() and tolerate "already ...".
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "coordinator_address", None) is not None:
            return  # already initialised (e.g. by a test harness or outer launcher)
    except ImportError:
        pass
    # jax's auto-detection only covers SLURM/MPI/GKE launchers; on a plain
    # multi-host launch the three env vars define the cluster explicitly.
    kw = {"coordinator_address": os.environ["JAX_COORDINATOR_ADDRESS"]}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kw)
    except RuntimeError as e:  # pragma: no cover - depends on jax internals
        if "already" not in str(e).lower():
            raise


def _build_train_sampler(cfg: TrainConfig):
    task = cfg.task
    tr = T.train_transform(task.sampling_rate, task.hop_length, task.num_frames)
    roots = list(cfg.data.train_roots)
    probs = list(cfg.data.train_probs) or [1.0] * len(roots)
    assert roots, "data.train_roots must be set"
    datasets = [VocoderDataset(root=r, transform=tr) for r in roots]
    return MixDataset(datasets=datasets, probs=probs).sample


def _make_template_fn(task):
    """Host-side f0 template builder for template-consuming generators
    (RefineGAN, use_template HiFiGAN/BigVGAN): audio (T,) -> template (T,)."""
    from vocoder_tpu.data.f0 import estimate_f0, template_from_f0

    def fn(audio: np.ndarray) -> np.ndarray:
        f0 = estimate_f0(audio, task.sampling_rate, task.hop_length)
        return template_from_f0(f0, task.sampling_rate, task.hop_length)

    return fn


def _make_ssl_feature_fn(task):
    """Host-side frozen HuBERT feature extractor for the ssl family
    (hifigan-vae.yaml composition): audio (B, T) -> features (B, T', hidden)."""
    from vocoder_tpu.models.ssl_encoders import HubertFeatureExtractor

    extractor = HubertFeatureExtractor(task.generator.hubert)
    return lambda audio: extractor(audio)


def _build_val_batches(cfg: TrainConfig):
    if cfg.data.val_root is None:
        return None
    task = cfg.task
    tr = T.val_transform(task.sampling_rate, task.hop_length, cfg.data.val_crop_frames)
    ds = VocoderDataset(root=cfg.data.val_root, transform=tr)
    target = task.hop_length * cfg.data.val_crop_frames
    rng = np.random.default_rng(cfg.run.seed)
    batches = []
    b = cfg.data.val_batch_size
    for i in range(0, len(ds), b):
        idxs = range(i, min(i + b, len(ds)))
        audios, lengths = [], []
        for j in idxs:
            a = ds.get(rng, j)[:1]
            t = a.shape[-1]
            if t >= target:
                a, t = a[..., :target], target
            else:
                a = np.pad(a, ((0, 0), (0, target - t)))
            audios.append(a)
            lengths.append(t)
        while len(audios) < b:  # static batch shape
            audios.append(np.zeros_like(audios[0]))
            lengths.append(0)
        batch = {"audio": np.stack(audios).astype(np.float32), "lengths": np.asarray(lengths, np.int64)}
        if gan.needs_template(task):
            tfn = _make_template_fn(task)
            batch["template"] = np.stack([tfn(a[0]) for a in audios])[:, None, :].astype(np.float32)
        batches.append(batch)
    if task.family == "ssl":
        ffn = _make_ssl_feature_fn(task)
        for batch in batches:
            batch["ssl_features"] = np.asarray(ffn(batch["audio"][:, 0, :]), np.float32)
    return batches


def train(cfg: TrainConfig) -> gan.TrainState:
    maybe_init_distributed()
    if cfg.run.precision == "default":
        nn.set_default_precision(lax.Precision.DEFAULT)
    mesh = make_mesh(data=cfg.run.data_parallel, model=cfg.run.model_parallel)
    # The mesh context makes models' activation sharding constraints
    # (parallel.constrain) bind at trace time; without it they are no-ops.
    with mesh:
        return _train(cfg, mesh)


def _train(cfg: TrainConfig, mesh) -> gan.TrainState:
    task = cfg.task
    workdir = Path(cfg.run.workdir)
    dp = mesh.shape["data"]
    local_bs_check = max(cfg.data.batch_size // jax.process_count(), 1)
    assert local_bs_check % dp == 0, (
        f"per-host batch {local_bs_check} must be divisible by the data axis {dp}; "
        f"set run.data_parallel accordingly"
    )
    assert cfg.data.val_batch_size % dp == 0 or cfg.data.val_root is None, (
        f"val batch {cfg.data.val_batch_size} must be divisible by the data axis {dp}"
    )
    log(f"mesh: data={dp} model={mesh.shape['model']}, devices={len(jax.devices())}")

    metrics_logger = MetricsLogger(workdir)
    ckpt = CheckpointManager(workdir / "checkpoints", save_interval_steps=cfg.run.ckpt_interval)

    # Config + hyperparameter capture (rich_utils config_tree.log +
    # logging_utils param-count analogue).  Before overwriting config.json,
    # guard auto-resume against a workdir left over from a DIFFERENT model:
    # restoring e.g. a refinegan checkpoint into a bigvgan state dies deep in
    # Orbax with a tree-structure dump, so fail here with the actual cause.
    import dataclasses as _dc
    import json as _json

    task_now = _json.loads(_json.dumps(_dc.asdict(cfg.task), default=str))
    cfg_path = workdir / "config.json"
    if cfg_path.exists() and ckpt.latest_step() is not None:
        try:
            task_prev = _json.loads(cfg_path.read_text()).get("task")
        except Exception:
            task_prev = None
        # Compare only keys recorded in the OLD config: fields added to
        # GANTaskConfig after the checkpoint was written (schema evolution)
        # must not block resuming it under their defaults.
        diff = (
            [k for k in sorted(task_prev) if k in task_now and task_prev[k] != task_now[k]]
            if task_prev is not None
            else []
        )
        if diff:
            raise SystemExit(
                f"workdir {workdir} holds a checkpoint (step {ckpt.latest_step()}) "
                f"trained with a different task config (differs in: {', '.join(diff)}). "
                "Point run.workdir at a fresh directory, or pass the old model/"
                "resolution flags to resume it."
            )
    if jax.process_index() == 0:
        workdir.mkdir(parents=True, exist_ok=True)
        cfg_path.write_text(_json.dumps(_dc.asdict(cfg), indent=2, default=str))

    # GSPMD init: leaves materialise directly into the mesh layout (works on
    # one host AND across processes; plain device_put cannot).
    state = gan.create_train_state_sharded(jax.random.key(cfg.run.seed), task, mesh)

    # Auto-resume (train.py:81-95 semantics).
    start_step = 0
    latest = ckpt.latest_step()
    if cfg.run.ckpt_path is not None and cfg.run.resume_weights_only:
        other = CheckpointManager(cfg.run.ckpt_path)
        state = other.restore_weights_only(state)
        state = shard_train_state(state, mesh, gan.model_param_specs(task))
        log(f"resumed weights only from {cfg.run.ckpt_path}")
    elif latest is not None:
        state = ckpt.restore(abstract_like(state))
        state = shard_train_state(state, mesh, gan.model_param_specs(task))
        start_step = int(state.step)
        log(f"auto-resumed from step {start_step}")

    log(
        f"params: generator {nn.param_count(state.gen_params):,}, "
        f"discriminators {nn.param_count(state.disc_params):,}"
    )

    if cfg.run.split_step:
        step_fn = gan.make_train_step_split(task)  # two jit programs (see gan.py)
    else:
        step_fn = jax.jit(gan.make_train_step(task), donate_argnums=0)
    eval_fn = jax.jit(gan.make_eval_step(task))

    sample_fn = _build_train_sampler(cfg)
    target_len = task.hop_length * task.num_frames
    local_bs = max(cfg.data.batch_size // jax.process_count(), 1)
    host_it = batch_iterator(
        sample_fn,
        batch_size=local_bs,
        target_length=target_len,
        seed=cfg.run.seed,
        host_index=jax.process_index(),
        start_step=start_step,
        num_workers=cfg.data.num_workers,
        template_fn=_make_template_fn(task) if gan.needs_template(task) else None,
        batch_feature_fn=_make_ssl_feature_fn(task) if task.family == "ssl" else None,
    )
    prefetcher = DevicePrefetcher(host_it, sharding=batch_sharding(mesh), depth=2)
    val_batches = _build_val_batches(cfg)
    mel_fn = jax.jit(lambda a: gan.loss_mel_transform(task, a))  # val viz features
    pesq_fn = _make_val_pesq(task) if cfg.run.val_pesq else None

    log(f"starting training at step {start_step} / {cfg.run.max_steps}")

    # host_step mirrors state.step on the host so checkpoint cadence never
    # forces a device->host readback (int(state.step)) that would serialise
    # against the async step dispatch.
    host_step = start_step
    # task_wrapper semantics (ref utils/utils.py:41-92): log the exception,
    # then always flush metrics and close the checkpoint manager.
    try:
        # Warm the compile; if the single fused program exhausts the compiler
        # (seen on remote-compile hosts: SIGKILL'ed helper), fall back to the
        # numerically-identical split-phase compile.
        if start_step < cfg.run.max_steps:
            first_batch = next(prefetcher)
            if not cfg.run.split_step:
                try:
                    state, metrics = step_fn(state, first_batch)
                except Exception as e:  # jax.errors.JaxRuntimeError from the compiler
                    log(f"fused train step failed to compile ({type(e).__name__}); retrying split-phase")
                    step_fn = gan.make_train_step_split(task)
                    state, metrics = step_fn(state, first_batch)
            else:
                state, metrics = step_fn(state, first_batch)
            host_step = start_step + 1
            ckpt.save(host_step, state)
            start_step = host_step

        t0 = time.perf_counter()
        window = max(cfg.run.log_interval, 1)
        profile = cfg.run.profile_steps  # jax.profiler trace window (SURVEY.md §5.1 gap)
        best_val, stale_vals = float("inf"), 0
        for step in range(start_step, cfg.run.max_steps):
            if profile and step == profile[0]:
                jax.profiler.start_trace(str(workdir / "profile"))
            batch = next(prefetcher)
            state, metrics = step_fn(state, batch)
            host_step = step + 1
            if profile and host_step == profile[1]:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                log(f"profiler trace written to {workdir / 'profile'}")

            if host_step % window == 0:
                jax.block_until_ready(metrics)
                dt = time.perf_counter() - t0
                sps = window / dt
                audio_s = local_bs * jax.process_count() * target_len / task.sampling_rate
                scalars = {k: float(v) for k, v in metrics.items()}
                scalars["perf/steps_per_s"] = sps
                scalars["perf/audio_s_per_s"] = sps * audio_s
                scalars["perf/input_wait_s"] = prefetcher.wait_seconds(reset=True)
                metrics_logger.write(host_step, scalars)
                log(
                    f"step {host_step}: g={scalars['train/generator/all']:.3f} "
                    f"d={scalars['train/discriminator/all']:.3f} mel={scalars['train/generator/mel']:.3f} "
                    f"({sps:.2f} steps/s, {scalars['perf/audio_s_per_s']:.1f} audio-s/s)"
                )
                t0 = time.perf_counter()

            if val_batches and host_step % cfg.run.val_interval == 0:
                mels = []
                first_fake = None
                pesqs = []
                for vb in val_batches:
                    vmetrics, fake = eval_fn(state, vb)
                    if first_fake is None:
                        first_fake = (np.asarray(fake), vb)
                    mels.append(float(vmetrics["val/metrics/mel"]))
                    if pesq_fn is not None:
                        pesqs.extend(pesq_fn(np.asarray(fake), vb))
                val_mel = float(np.mean(mels))
                val_scalars = {"val/metrics/mel": val_mel}
                if pesqs:
                    val_scalars["val/metrics/pesq"] = float(np.mean(pesqs))
                metrics_logger.write(host_step, val_scalars)
                log(
                    f"step {host_step}: val mel-L1 {val_mel:.4f}"
                    + (f", PESQ {val_scalars['val/metrics/pesq']:.3f}" if pesqs else "")
                )
                if cfg.run.early_stop_patience is not None:
                    if val_mel < best_val - 1e-6:
                        best_val, stale_vals = val_mel, 0
                    else:
                        stale_vals += 1
                        if stale_vals >= cfg.run.early_stop_patience:
                            log(f"early stop: no val improvement in {stale_vals} validations")
                            break
                # Media logging: GT-vs-generated audio AND mel figures for the
                # first val clip (report_val_metrics analogue, vocoder.py:48-118).
                fake_np, vb = first_fake
                n = int(vb["lengths"][0])
                if n > 0 and jax.process_index() == 0:
                    gt_np = np.asarray(vb["audio"])
                    metrics_logger.add_audio(host_step, "val/audio/gt", gt_np[0, 0, :n], task.sampling_rate)
                    metrics_logger.add_audio(host_step, "val/audio/pred", fake_np[0, 0, :n], task.sampling_rate)
                    nf = max(n // task.hop_length, 1)
                    gt_mel = np.asarray(mel_fn(gt_np[:1, 0]))[0, :, :nf]
                    pred_mel = np.asarray(mel_fn(fake_np[:1, 0]))[0, :, :nf]
                    fig = plot_mel([gt_mel, pred_mel], ["ground truth", "generated"])
                    if fig is not None:
                        metrics_logger.add_figure(host_step, "val/mel", fig)

            ckpt.save(host_step, state)

        if ckpt.latest_step() != host_step:
            ckpt.save(host_step, state, force=True)
    except BaseException as e:
        import traceback

        log(f"training failed at step {host_step}: {type(e).__name__}: {e}")
        if jax.process_index() == 0:
            (workdir / "crash.log").write_text(traceback.format_exc())
        raise
    finally:
        ckpt.wait()
        prefetcher.close()
        metrics_logger.close()
    return state


def _make_val_pesq(task):
    """Host-side val PESQ callback (ref models/vocoder.py:40-46): resample the
    GT/generated pair to 16 kHz and score with the native P.862 implementation.
    Returns a fn((B,1,T) fake, batch) -> list of MOS-LQO floats."""
    from vocoder_tpu.data.resample import resample
    from vocoder_tpu.eval_metrics import pesq as pesq_metric

    def run(fake: np.ndarray, batch: dict) -> list:
        out = []
        audio = np.asarray(batch["audio"])
        lengths = np.asarray(batch["lengths"])
        for i in range(audio.shape[0]):
            n = int(lengths[i])
            if n <= 0:
                continue
            ref16 = resample(audio[i, 0, :n], task.sampling_rate, 16000)
            deg16 = resample(fake[i, 0, :n], task.sampling_rate, 16000)
            try:
                out.append(pesq_metric(ref16, deg16, 16000, mode="wb"))
            except Exception:
                pass  # degenerate clip (all-silence etc.)
        return out

    return run
