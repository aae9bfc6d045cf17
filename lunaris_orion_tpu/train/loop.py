"""Training orchestration — the TrainingManager equivalent.

Maps the reference's trainer (train_hybrid.py:230-1070) onto the TPU runtime:

  * one jitted, donated train step over a ('data','model') mesh — no
    per-batch Python in the hot loop beyond the loader handoff;
  * static XLA memory planning replaces the reactive OOM batch-halving
    (train_hybrid.py:341-380): the step is compiled ahead of training, its
    memory_analysis is checked against device HBM, and if it does not fit
    the batch size is halved *before* training starts (north-star
    requirement; same knobs --batch_size / --gradient_accumulation_steps);
  * early stopping on epoch train loss — repaired: the reference's
    epoch_losses list is never appended so its early stopping/best logic
    compares against NaN and never fires (SURVEY.md §2.2 #19);
  * periodic saves (--save_every) + rotation (--keep_n_checkpoints)
    actually implemented (declared but missing in the reference, §2.2 #21);
  * SIGINT-safe checkpoint-and-exit (train_hybrid.py:311,587-592);
  * eval comparison grids every --eval_save_freq micro-steps
    (train_hybrid.py:718-789);
  * trigger flags (--log_every etc.) count micro-batches like the
    reference's global_step (incremented per micro-batch, :949).
"""

from __future__ import annotations

import os
import signal
import threading
import time
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lunaris_orion_tpu.config import TrainConfig
from lunaris_orion_tpu.data.dataset import SpriteDataset, BatchLoader, train_val_split
from lunaris_orion_tpu.models import teacher as teacher_mod
from lunaris_orion_tpu.models import vae as vae_mod
from lunaris_orion_tpu.parallel import make_mesh, state_shardings, batch_sharding
from lunaris_orion_tpu.train.checkpoint import CheckpointService
from lunaris_orion_tpu.train.state import create_state
from lunaris_orion_tpu.train.step import make_train_step, make_eval_step, normalize_images
from lunaris_orion_tpu.utils.image import comparison_grid
from lunaris_orion_tpu.utils.logging import setup_logging
from lunaris_orion_tpu.utils.metrics import MetricsWriter


def _chain_steps(step_fn, spc: int, accum: int, *, cached: bool):
    """Wrap a train step into a K=steps_per_call chain: one dispatched XLA
    call consumes [K*accum, B, ...] staged micro-batches and runs K full
    optimizer steps via lax.scan (identical math to K sequential calls —
    the scan carries the same TrainState the per-step loop would). Metrics
    come back stacked [K] per scalar so the host can still log every step
    at its exact value. K=1 returns step_fn unchanged (reference-exact)."""
    if spc <= 1:
        return step_fn

    if cached:
        def chained(state, batches, pes):
            kb = batches.reshape(spc, accum, *batches.shape[1:])
            kp = pes.reshape(spc, accum, *pes.shape[1:])

            def body(s, xs):
                b, p = xs
                return step_fn(s, b, p)

            return jax.lax.scan(body, state, (kb, kp))
    else:
        def chained(state, batches):
            kb = batches.reshape(spc, accum, *batches.shape[1:])
            return jax.lax.scan(lambda s, b: step_fn(s, b), state, kb)

    return chained


class HangWatchdog:
    """Failure detection for wedged device calls (SURVEY.md §5 'failure
    detection/recovery'; the reference trainer has none — train_hybrid.py
    catches OOM, but a dropped CUDA/transport call blocks it forever).
    Remote-TPU transports can drop a dispatched call without raising:
    observed live in r5 (demo/runs_r5_highend/training.log, 40-min gap
    after step 700 — the host thread sat in a device wait at 0 CPU while
    the device had already released the call). A daemon thread escalates
    when no training heartbeat lands within `timeout_s`: CRITICAL log,
    then `on_hang()` — default `os._exit(66)` so a supervisor restarts
    from the last checkpoint (the device connection is unrecoverable from
    inside the process; any device op, including a checkpoint save, would
    itself hang). Size the timeout well above one dispatched call:
    >= 2x steps_per_call x step time, and above Orbax save latency."""

    EXIT_CODE = 66

    def __init__(self, timeout_s: float, logger,
                 on_hang: Optional[Callable[[], None]] = None,
                 poll_s: float = 10.0):
        self.timeout_s = float(timeout_s or 0)
        self.logger = logger
        self.poll_s = poll_s
        self._on_hang = on_hang or (lambda: os._exit(self.EXIT_CODE))
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def beat(self) -> None:
        self._last = time.monotonic()

    def start(self) -> None:
        if self.timeout_s > 0 and self._thread is None:
            self.beat()
            self._thread = threading.Thread(
                target=self._run, daemon=True, name="hang-watchdog")
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()

    def _run(self) -> None:
        while not self._stop.wait(self.poll_s):
            idle = time.monotonic() - self._last
            if idle > self.timeout_s:
                self.logger.critical(
                    "HangWatchdog: no training heartbeat for %.0f s "
                    "(timeout %.0f s) — the device transport likely "
                    "dropped a dispatched call; the process cannot "
                    "recover. Exiting %d; restart with --resume_from "
                    "<output_dir>/checkpoints.",
                    idle, self.timeout_s, self.EXIT_CODE)
                self._on_hang()
                return


class EarlyStopping:
    """Patience counter on epoch loss (train_hybrid.py:206-225)."""

    def __init__(self, patience: int = 7, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.best_loss: Optional[float] = None
        self.early_stop = False

    def __call__(self, loss: float) -> None:
        if self.best_loss is None:
            self.best_loss = loss
        elif loss > self.best_loss + self.min_delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_loss = loss
            self.counter = 0


def _fmt(metrics: dict) -> str:
    return " ".join(f"{k}={float(v):.4f}" for k, v in sorted(metrics.items()))


def compute_embed_table(embed_fn, state, dataset, *, batch_size: int,
                        embedding_dim: int, shard) -> np.ndarray:
    """Per-sample prompt-embedding table, chunked through `embed_fn`.

    Multi-host (SURVEY.md §2.7 DCN axis): each global chunk is assembled
    from per-process row slices (mirroring BatchLoader._stage), the jitted
    embed step runs on the sharded global batch, and the sharded output is
    allgathered back so every host holds the FULL table (shuffled batches
    later index arbitrary rows from any host). Executed-for-real evidence:
    tools/multihost_smoke.py runs this across 2 OS processes."""
    nproc, pidx = jax.process_count(), jax.process_index()
    chunk = max(batch_size, nproc)
    chunk -= chunk % nproc
    per = chunk // nproc
    table = np.zeros((len(dataset), embedding_dim), np.float32)
    for start in range(0, len(dataset), chunk):
        idx = np.arange(start, min(start + chunk, len(dataset)))
        lo, hi = pidx * per, (pidx + 1) * per
        local = idx[lo:hi] if nproc > 1 else idx
        imgs = dataset.gather(local)
        want = per if nproc > 1 else chunk
        if len(local) < want:  # pad to the jitted shape
            pad = np.zeros((want - len(local),) + imgs.shape[1:], np.uint8)
            imgs = np.concatenate([imgs, pad])
        if nproc > 1:
            staged = jax.make_array_from_process_local_data(shard, imgs)
            emb_g = embed_fn(state, staged)
            from jax.experimental import multihost_utils
            emb = np.asarray(
                multihost_utils.process_allgather(emb_g, tiled=True))
        else:
            emb = np.asarray(embed_fn(state, jnp.asarray(imgs)))
        table[idx] = emb[:len(idx)]
    return table


def _attn_impl(cfg: TrainConfig) -> str:
    """Resolve the teacher attention implementation from the two knobs.

    cfg.attn_impl != 'auto' selects an implementation directly ('full' /
    'flash' / 'pallas' / 'ring' / 'allgather'); conflicts with use_pallas
    raise rather
    than letting one knob silently override the other. With attn_impl ==
    'auto': use_pallas True -> force Pallas (asserts backend/shape support,
    ops/attention.py), False -> force the XLA flash composition, None ->
    auto dispatch (ops/dispatch.py)."""
    impl = getattr(cfg, "attn_impl", "auto")
    if impl != "auto":
        if cfg.use_pallas is True and impl != "pallas":
            raise ValueError(
                f"--attn_impl {impl} conflicts with --use_pallas; drop one")
        if cfg.use_pallas is False and impl == "pallas":
            raise ValueError(
                "--attn_impl pallas conflicts with --no-use_pallas")
        return impl
    if cfg.use_pallas is True:
        return "pallas"
    if cfg.use_pallas is False:
        return "flash"
    return "auto"


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.vcfg = cfg.vae_config()
        self.tcfg = cfg.teacher_config()
        self.out_dir = Path(cfg.output_dir)
        self.logger = setup_logging(str(self.out_dir))
        self.metrics = MetricsWriter(str(self.out_dir / "tensorboard"))
        (self.out_dir / "eval_samples").mkdir(parents=True, exist_ok=True)

        # Persistent compilation cache: the hybrid step is a large program
        # (first TPU compile takes minutes through a cold toolchain); cached
        # executables make reruns/resumes start in seconds.
        try:
            cache_dir = Path.home() / ".cache" / "lunaris_jax_cache"
            cache_dir.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass
        if cfg.force_cpu:
            jax.config.update("jax_platforms", "cpu")
        if cfg.fast_rng:
            # Hardware RngBitGenerator for dropout masks: ablation on v5e
            # showed threefry mask generation alone costs ~27% of the hybrid
            # step (BASELINE.md). Mask *distribution* is identical.
            try:
                jax.config.update("jax_default_prng_impl", "rbg")
            except Exception:
                pass
        if cfg.debug_nans:
            # race-detector analogue for numerics (SURVEY.md §5): every op is
            # checked for NaN/Inf on the host — slow, debugging only.
            jax.config.update("jax_debug_nans", True)
        devices = jax.devices()
        self.logger.info("Devices: %s", devices)

        self.mesh = make_mesh(cfg.mesh_shape, devices=devices)
        self.logger.info("Mesh: %s", dict(self.mesh.shape))
        self._interrupted = False

        impl = _attn_impl(cfg)
        self._cp = {}
        if impl in ("ring", "allgather"):
            from lunaris_orion_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
            mp = self.mesh.shape[MODEL_AXIS]
            n_tok = cfg.image_size * cfg.image_size
            if mp <= 1:
                raise ValueError(
                    f"--attn_impl {impl} needs a mesh model axis > 1 "
                    f"(context parallelism shards tokens over it); got mesh "
                    f"{dict(self.mesh.shape)}. Pass --mesh_shape DATA MODEL")
            if n_tok % mp != 0:
                raise ValueError(
                    f"--attn_impl {impl}: token count {n_tok} "
                    f"(image_size^2) is not divisible by the model axis "
                    f"size {mp}")
            # The CP shard_map runs over the model axis; the batch dim
            # stays sharded over the data axis (no gather).
            self._cp = dict(cp_mesh=self.mesh, cp_axis=MODEL_AXIS,
                            cp_batch_axis=DATA_AXIS)

        # --- static memory planning fused with the real compile ----------
        abstract = jax.eval_shape(
            lambda k: create_state(k, self.cfg, self.vcfg, self.tcfg),
            jax.random.PRNGKey(self.cfg.seed))
        self.shardings = state_shardings(
            abstract, self.mesh, num_experts=self.tcfg.num_experts,
            latent_dim=self.vcfg.latent_dim,
            # CP (ring/allgather) uses the model axis for the token dim —
            # experts stay replicated (can't also shard them over the same
            # axis).
            shard_experts=impl not in ("ring", "allgather"))
        self.abstract_state = jax.tree_util.tree_map(
            lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
            abstract, self.shardings)
        self.batch_shard = batch_sharding(self.mesh)

        self.cfg, self.train_step = self._plan_and_compile(self.cfg)
        cfg = self.cfg
        self.eval_step = jax.jit(
            make_eval_step(cfg, self.vcfg, self.tcfg,
                           attn_impl=_attn_impl(cfg), **self._cp),
            in_shardings=(self.shardings, batch_sharding(self.mesh, leading_accum=False)))

        # --- data ---------------------------------------------------------
        self.dataset = SpriteDataset(cfg.data_dir, image_size=cfg.image_size)
        tr_idx, va_idx = train_val_split(len(self.dataset), cfg.val_fraction,
                                         cfg.seed)
        device_data = cfg.device_data
        if device_data:
            corpus = ((len(tr_idx) + len(va_idx))
                      * cfg.image_size * cfg.image_size * 3)
            need, hbm = getattr(self, "_plan_need", None), \
                getattr(self, "_plan_hbm", None)
            if jax.process_count() > 1:
                self.logger.warning(
                    "--device_data: multi-host residency unimplemented — "
                    "streaming instead")
                device_data = False
            elif need and hbm and need + corpus > 0.92 * hbm:
                self.logger.warning(
                    "--device_data: corpus %.2f GB + compiled step %.2f GB "
                    "exceeds the %.2f GB HBM budget — streaming instead",
                    corpus / 2**30, need / 2**30, 0.92 * hbm / 2**30)
                device_data = False
            else:
                self.logger.info(
                    "--device_data: corpus resident in HBM (%.2f GB; "
                    "batches gather on device, zero per-step staging)",
                    corpus / 2**30)
        self.train_loader = BatchLoader(
            self.dataset, tr_idx, batch_size=cfg.batch_size,
            # steps_per_call K chains K optimizer steps per dispatched
            # call: the loader stages K*accum micro-batches as ONE device
            # array (one transfer), the jitted wrapper scans them.
            accum_steps=(cfg.gradient_accumulation_steps
                         * cfg.steps_per_call), seed=cfg.seed,
            sharding=self.batch_shard, prefetch=cfg.prefetch_depth,
            with_indices=cfg.cached_prompt_embeddings,
            device_data=device_data)
        self.val_loader = BatchLoader(
            self.dataset, va_idx, batch_size=cfg.batch_size, accum_steps=1,
            seed=cfg.seed, shuffle=False, squeeze_accum=True,
            sharding=batch_sharding(self.mesh, leading_accum=False),
            device_data=device_data)
        self.logger.info("Dataset: %d sprites (%d train / %d val batches)",
                         len(self.dataset), len(self.train_loader),
                         len(self.val_loader))

        # --- state: fresh or resume ----------------------------------------
        self.ckpt = CheckpointService(str(self.out_dir / "checkpoints"),
                                      keep_n=cfg.keep_n_checkpoints)
        if cfg.resume_from and cfg.resume_from.endswith(".pt"):
            # Mid-training migration from a reference torch checkpoint
            # (train_hybrid.py:594-615): params, BN stats, both Adam
            # m/v/step and the schedule position all carry over; the RL
            # baseline resets exactly as a reference resume does.
            from lunaris_orion_tpu.utils import torch_compat
            host_state = torch_compat.train_state_from_torch_checkpoint(
                cfg.resume_from, cfg, vcfg=self.vcfg, tcfg=self.tcfg)
            self.state = jax.device_put(host_state, self.shardings)
            self.logger.info("Resumed from reference checkpoint %s at "
                             "step %d", cfg.resume_from,
                             int(self.state.step))
        elif cfg.resume_from:
            resume = CheckpointService(cfg.resume_from,
                                       keep_n=cfg.keep_n_checkpoints) \
                if Path(cfg.resume_from).absolute() != (self.out_dir / "checkpoints").absolute() \
                else self.ckpt
            self.state = resume.restore(self.abstract_state)
            self.logger.info("Resumed at step %d", int(self.state.step))
        else:
            self.state = jax.jit(
                lambda k: create_state(k, cfg, self.vcfg, self.tcfg),
                out_shardings=self.shardings)(jax.random.PRNGKey(cfg.seed))

        n_vae = vae_mod.param_count(self.state.vae_params)
        n_teacher = teacher_mod.param_count(self.state.teacher_params)
        self.logger.info("VAE params: %s | Teacher params: %s",
                         f"{n_vae:,}", f"{n_teacher:,}")
        self.early = EarlyStopping(cfg.early_stopping_patience)

    # ------------------------------------------------------------------
    def _plan_and_compile(self, cfg: TrainConfig):
        """Static memory planning fused with the production compile: lower
        and compile the sharded, donated train step; check its XLA memory
        analysis against device HBM; halve the batch and retry if it does
        not fit. The surviving compiled executable IS the train step — no
        second compile, no runtime OOM heuristics (replaces the reference's
        dynamic batch halving, train_hybrid.py:341-380)."""
        from lunaris_orion_tpu.utils.hbm import device_hbm_bytes
        dev = jax.devices()[0]
        # memory_stats() can be hidden by the transport (utils/hbm.py) —
        # r1's planner "fit" vacuously on this host and the worker died.
        hbm = device_hbm_bytes(dev)

        min_bs = max(cfg.batch_size // 8, 1)  # reference floor (:253-257)
        bs = cfg.batch_size
        # remat costs ~23% of the hybrid step in recompute (BASELINE.md);
        # prefer no-remat whenever the executable fits HBM.
        remat_candidates = ((False, True) if cfg.remat is None
                            else (cfg.remat,))
        attn_impl = _attn_impl(cfg)
        spc = max(int(getattr(cfg, "steps_per_call", 1) or 1), 1)
        while True:
            trial = cfg.replace(batch_size=bs)
            acc = trial.gradient_accumulation_steps
            batch_abs = jax.ShapeDtypeStruct(
                (spc * acc, bs,
                 trial.image_size, trial.image_size, 3), jnp.uint8)
            abstract_args = [self.abstract_state, batch_abs]
            in_shardings = [self.shardings, self.batch_shard]
            if cfg.cached_prompt_embeddings:
                abstract_args.append(jax.ShapeDtypeStruct(
                    (spc * acc, bs,
                     self.tcfg.embedding_dim), jnp.float32))
                in_shardings.append(self.batch_shard)
            for remat in remat_candidates:
                step_fn = make_train_step(trial, self.vcfg, self.tcfg,
                                          remat=remat,
                                          attn_impl=attn_impl, **self._cp)
                jitted = jax.jit(
                    _chain_steps(step_fn, spc, acc,
                                 cached=cfg.cached_prompt_embeddings),
                    in_shardings=tuple(in_shardings),
                    out_shardings=(self.shardings, None),
                    donate_argnums=0 if trial.donate_state else ())
                t0 = time.time()
                need = None
                try:
                    compiled = jitted.lower(*abstract_args).compile()
                    self.logger.info(
                        "train step compiled in %.1fs (batch %d, remat=%s)",
                        time.time() - t0, bs, remat)
                    mem = compiled.memory_analysis()
                    if mem is not None:
                        need = (getattr(mem, "temp_size_in_bytes", 0)
                                + getattr(mem, "argument_size_in_bytes", 0)
                                + getattr(mem, "output_size_in_bytes", 0))
                except Exception as e:
                    # XLA:TPU reports >HBM allocations as a compile-time
                    # permanent error rather than via memory_analysis —
                    # treat as "too big" and continue planning.
                    if "out of memory" not in str(e).lower():
                        raise
                    self.logger.info(
                        "batch %d remat=%s: compile-time HBM OOM (%s)",
                        bs, remat, str(e).splitlines()[-1][:120])
                    need = float("inf")
                if need != float("inf") and (
                        hbm is None or need is None or need < 0.92 * hbm):
                    if need and hbm:
                        self.logger.info(
                            "Static memory plan: step needs %.2f GB of "
                            "%.2f GB HBM (batch %d, remat=%s)",
                            need / 2**30, hbm / 2**30, bs, remat)
                    if bs != cfg.batch_size:
                        self.logger.warning(
                            "Static memory plan: batch_size %d -> %d",
                            cfg.batch_size, bs)
                    self._plan_need, self._plan_hbm = need, hbm
                    return trial, compiled
                self.logger.info(
                    "batch %d remat=%s needs %.2f GB > %.2f GB budget",
                    bs, remat, need / 2**30,
                    0.92 * hbm / 2**30 if hbm else float("nan"))
            if bs <= min_bs:
                raise RuntimeError(
                    f"train step does not fit HBM even at batch {min_bs}; "
                    "reduce model dims or raise gradient_accumulation_steps")
            bs //= 2

    # ------------------------------------------------------------------
    def _stage_pe(self, local_rows: np.ndarray):
        """Stage a process-local embedding slice under the batch sharding —
        the same contract as BatchLoader._stage: under multi-host the loader
        yields process-local index slices, so the looked-up rows are this
        process's shard of the global [accum, batch, emb] array and must be
        assembled with make_array_from_process_local_data (plain device_put
        fails for a cross-process NamedSharding)."""
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                self.batch_shard, local_rows)
        return jax.device_put(local_rows, self.batch_shard)

    def _refresh_embed_table(self) -> None:
        """Recompute the per-sample prompt-embedding table (cached mode —
        the reference's intended dataset-side hook, train_hybrid.py:157-171;
        see train/step.py docstring for the deviation contract)."""
        from lunaris_orion_tpu.train.step import make_embed_step
        if not hasattr(self, "_embed_fn"):
            sh = batch_sharding(self.mesh, leading_accum=False)
            self._embed_fn = jax.jit(
                make_embed_step(self.cfg, self.tcfg,
                                attn_impl=_attn_impl(self.cfg), **self._cp),
                in_shardings=(self.shardings, sh))
            self._embed_shard = sh
        t0 = time.time()
        self._embed_table = compute_embed_table(
            self._embed_fn, self.state, self.dataset,
            batch_size=self.cfg.batch_size,
            embedding_dim=self.tcfg.embedding_dim, shard=self._embed_shard)
        self.logger.info("Prompt-embedding table refreshed "
                         "(%d samples, %.1fs)",
                         len(self.dataset), time.time() - t0)

    # ------------------------------------------------------------------
    def _handle_interrupt(self, signum, frame):
        self.logger.warning("Interrupt received — saving checkpoint...")
        self._interrupted = True

    def _micro_crossed(self, every: int, step: int) -> bool:
        """True if any micro-step in the last optimizer step hit `every`
        (reference counts micro-batches, train_hybrid.py:945-952). `step` is
        the host-side optimizer-step counter — reading state.step would
        force a device sync every iteration."""
        return self._crossed_range(every, step - 1, step)

    def _crossed_range(self, every: int, lo: int, hi: int) -> bool:
        """True if any micro-step in optimizer steps (lo, hi] hit `every`
        (the steps_per_call>1 generalization of _micro_crossed)."""
        a = self.cfg.gradient_accumulation_steps
        return ((hi * a) // every != (lo * a) // every) if every > 0 else False

    @property
    def _render_fn(self):
        """Jitted original-vs-recon render (eval mode) for the sample grids;
        eager model calls at 128px would dispatch thousands of ops."""
        if not hasattr(self, "_render_cache"):
            vcfg, tcfg = self.vcfg, self.tcfg
            # Render in the TRAINING compute dtype: bf16 under
            # --mixed_precision. Faithful (the reference's attention runs
            # under an unconditional fp16 autocast even at eval,
            # lunar_evaluator.py:188 — parity.md #13) and necessary: the
            # f32 Pallas path at high-end dims (head_dim 64, N=16384)
            # exceeds the v5e's 16M scoped-VMEM stack (measured r5,
            # demo/runs_r5_highend crash at the eval-grid boundary).
            dt = jnp.bfloat16 if self.cfg.mixed_precision else jnp.float32

            @jax.jit
            def render(vae_params, teacher_params, teacher_stats, imgs):
                x = normalize_images(imgs, dt)
                recon, _, _ = vae_mod.apply(vae_params, x, rng=None,
                                            cfg=vcfg, sample_posterior=False)
                out, _ = teacher_mod.apply(teacher_params, teacher_stats,
                                           recon, cfg=tcfg, train=False)
                return (x.astype(jnp.float32), recon.astype(jnp.float32),
                        out["quality_scores"].astype(jnp.float32),
                        out["semantic_score"].astype(jnp.float32))

            @jax.jit
            def prior(vae_params, rng):
                return vae_mod.sample(vae_params, rng, 4, vcfg)

            self._render_cache = (render, prior)
        return self._render_cache

    def _eval_grid_images(self, device_batch) -> np.ndarray:
        """First <=4 images of the batch currently being processed — the
        reference renders the in-flight batch (train_hybrid.py:951-952),
        not fixed dataset rows. Falls back to dataset rows only when the
        sharded batch is not fully addressable from this host."""
        try:
            return np.asarray(device_batch[0, :4])
        except RuntimeError:  # multi-host: non-addressable shards
            # (jax raises RuntimeError for fetches of non-addressable
            # data; anything else should surface, not silently swap the
            # grid contents for fixed dataset rows.)
            return self.dataset.gather(
                np.arange(min(4, len(self.dataset))))

    def _save_eval_samples(self, batch4: np.ndarray) -> None:
        render, _ = self._render_fn
        x, recon, quality, semantic = render(
            self.state.vae_params, self.state.teacher_params,
            self.state.teacher_stats, jnp.asarray(batch4))
        grid = comparison_grid(np.asarray(x), np.asarray(recon),
                               quality=np.asarray(quality),
                               semantic=np.asarray(semantic))
        path = (self.out_dir / "eval_samples"
                / f"comparison_{int(self.state.step)}_{int(time.time())}.png")
        grid.save(path)
        self.logger.info("Saved eval grid -> %s", path)

    def _save_prior_samples(self) -> None:
        """Prior-decode grid every --sample_every micro-steps (the reference
        parses the flag but never implements it, SURVEY.md §2.8)."""
        from lunaris_orion_tpu.utils.image import sample_grid
        _, prior = self._render_fn
        imgs = prior(self.state.vae_params,
                     jax.random.fold_in(self.state.rng, 7))
        path = (self.out_dir / "eval_samples"
                / f"samples_{int(self.state.step)}_{int(time.time())}.png")
        sample_grid(np.asarray(imgs)).save(path)
        self.logger.info("Saved prior-sample grid -> %s", path)

    # ------------------------------------------------------------------
    def train(self) -> dict:
        cfg = self.cfg
        old_sigint = signal.signal(signal.SIGINT, self._handle_interrupt)
        result = {"stopped_early": False, "epochs": 0, "best_loss": float("inf")}
        best_loss = float(self.state.best_loss) if np.isfinite(
            float(self.state.best_loss)) else float("inf")
        host_step = int(self.state.step)
        watchdog = HangWatchdog(cfg.hang_watchdog_secs, self.logger)
        watchdog.start()
        try:
            for epoch in range(cfg.num_epochs):
                self.train_loader.set_epoch(epoch)
                if cfg.cached_prompt_embeddings and \
                        epoch % max(cfg.embed_refresh_epochs, 1) == 0:
                    self._refresh_embed_table()
                t_epoch = time.time()
                losses = []   # device scalars; floats only at boundaries
                n_img = 0
                for item in self.train_loader:
                    if cfg.cached_prompt_embeddings:
                        batch, b_idx = item
                        pe = self._stage_pe(self._embed_table[b_idx])
                    else:
                        batch = item
                    if cfg.profile_steps > 0 and epoch == 0 and host_step == 2:
                        jax.profiler.start_trace(
                            str(self.out_dir / "profile"))
                    if cfg.cached_prompt_embeddings:
                        self.state, m = self.train_step(self.state, batch, pe)
                    else:
                        self.state, m = self.train_step(self.state, batch)
                    if cfg.profile_steps > 0 and epoch == 0 \
                            and host_step == 1 + cfg.profile_steps:
                        jax.block_until_ready(m["total_loss"])
                        jax.profiler.stop_trace()
                        self.logger.info("Profiler trace -> %s",
                                         self.out_dir / "profile")
                    spc = cfg.steps_per_call
                    prev_step, host_step = host_step, host_step + spc
                    # Keep metrics on device; sync only on a sliding window
                    # so steps dispatch ahead of completion (the per-step
                    # float() here serialized host and device).
                    losses.append(m["total_loss"])
                    if len(losses) >= 3:
                        jax.block_until_ready(losses[-3])
                    # Heartbeat AFTER the sync point: a wedged transport
                    # blocks in block_until_ready above, so the beat stops
                    # landing and the watchdog fires.
                    watchdog.beat()
                    n_img += (cfg.batch_size
                              * cfg.gradient_accumulation_steps * spc)

                    # Per-step logging stays exact under steps_per_call>1:
                    # metrics come back stacked [K], sliced at each crossed
                    # boundary. State-dependent actions (grids, samples,
                    # checkpoints) use the post-call state — at most K-1
                    # steps late, by documented design.
                    for s in range(prev_step + 1, host_step + 1):
                        if self._micro_crossed(cfg.log_every, s):
                            ms = (m if spc == 1 else jax.tree_util.tree_map(
                                lambda a, i=s - prev_step - 1: a[i], m))
                            self.metrics.log(
                                ms, s * cfg.gradient_accumulation_steps)
                            self.logger.info("step %d | %s", s, _fmt(ms))
                    if self._crossed_range(cfg.eval_save_freq,
                                           prev_step, host_step):
                        self._save_eval_samples(self._eval_grid_images(batch))
                    if self._crossed_range(cfg.sample_every,
                                           prev_step, host_step):
                        self._save_prior_samples()
                    if self._crossed_range(cfg.save_every,
                                           prev_step, host_step):
                        self.ckpt.save(host_step, self.state, config=cfg)
                    if self._interrupted:
                        raise KeyboardInterrupt
                dt = time.time() - t_epoch

                # ---- epoch summary (repaired: losses actually collected) --
                # losses entries are device scalars (K=1) or [K] stacks.
                avg_loss = (float(np.mean(np.concatenate(
                    [np.atleast_1d(np.asarray(x, dtype=np.float64))
                     for x in losses]))) if losses else float("nan"))
                val_metrics = {}
                for vb in self.val_loader:
                    vm = self.eval_step(self.state, vb)
                    for k, v in vm.items():
                        val_metrics.setdefault(k, []).append(float(v))
                    watchdog.beat()
                val_metrics = {k: float(np.mean(v))
                               for k, v in val_metrics.items()}
                ips = n_img / dt if dt > 0 else 0.0
                self.logger.info(
                    "epoch %d/%d | avg_loss=%.4f | %s | %.1f sprites/s (%.1fs)",
                    epoch + 1, cfg.num_epochs, avg_loss,
                    _fmt(val_metrics), ips, dt)
                mem_stats = getattr(jax.devices()[0], "memory_stats",
                                    lambda: None)() or {}
                mem_gb = mem_stats.get("bytes_in_use", 0) / 2**30
                if mem_gb:
                    val_metrics["device_mem_gb"] = mem_gb
                self.metrics.log({"epoch_loss": avg_loss,
                                  "sprites_per_sec": ips, **val_metrics},
                                 host_step *
                                 cfg.gradient_accumulation_steps,
                                 prefix="epoch")

                is_best = np.isfinite(avg_loss) and avg_loss < best_loss
                if is_best:
                    best_loss = avg_loss
                    self.state = self.state.replace(
                        best_loss=jnp.asarray(best_loss, jnp.float32))
                self.ckpt.save(host_step, self.state, config=cfg,
                               best=is_best, force=True)
                watchdog.beat()
                result["epochs"] = epoch + 1
                result["best_loss"] = best_loss

                self.early(avg_loss if np.isfinite(avg_loss) else float("inf"))
                if self.early.early_stop:
                    self.logger.info("Early stopping at epoch %d", epoch + 1)
                    result["stopped_early"] = True
                    break
        except KeyboardInterrupt:
            self.logger.warning("Interrupted — saving final checkpoint")
            self.ckpt.save(host_step, self.state, config=cfg,
                           force=True)
            result["interrupted"] = True
        finally:
            watchdog.stop()
            self.ckpt.wait()
            self.metrics.close()
            signal.signal(signal.SIGINT, old_sigint)
        return result
