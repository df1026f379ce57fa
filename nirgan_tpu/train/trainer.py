"""Training orchestration — the reference's PL ``Trainer`` + callback stack
(``train.py:84-136``) as one explicit loop.

What the PL machinery did implicitly, spelled out:
  * epoch loop + step cap (``max_steps=200_000``, ``train.py:124``)
  * validation every epoch, capped batches (``limit_val_batches=5``)
  * ModelCheckpoint(monitor=val/L1, min, save_last, top-1) → orbax best/last
  * two ReduceLROnPlateau schedulers, patience from config, factor left at
    the torch default (reference quirk, see ``train/scheduler.py``)
  * LearningRateMonitor → ``lr/G``, ``lr/D`` scalars
  * config snapshot into the experiment dir at epoch 1
    (``model/pix2pix.py:321-324``)
  * image panels + input-stats + per-index dicts for the first
    ``num_val_images`` val batches (``model/pix2pix.py:286-315``)
  * best-effort offline validation callbacks — never kill training
    (``model/pix2pix.py:329-344``)

TPU-native additions the reference lacks (SURVEY.md §5.1-§5.3):
  * per-step wall-clock + images/sec logging
  * optional ``jax.profiler`` trace capture (NIRGAN_PROFILE_DIR env var)
  * finite-loss guard (EarlyStopping(check_finite) was constructed but never
    passed to the reference Trainer, ``train.py:110-131``; here it is real)
  * optional NaN debugging via ``config.tpu.debug_nans``
"""

from __future__ import annotations

import datetime
import os
import signal
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nirgan_tpu.config import save_config, tpu_section
from nirgan_tpu.data.pipeline import DeviceFeed
from nirgan_tpu.parallel import create_mesh, replicate, replicated_sharding, shard_batch
from nirgan_tpu.train.checkpoint import CheckpointManager, merge_params
from nirgan_tpu.train.scheduler import ReduceLROnPlateau
from nirgan_tpu.utils.loggers import ExperimentLogger

__all__ = ["Trainer"]


class Trainer:
    def __init__(self, task, datamodule, config, logdir: Optional[str] = None,
                 mesh=None, max_steps: Optional[int] = None,
                 limit_val_batches: Optional[int] = None, log_every: int = 10,
                 seed: int = 0, val_check_interval: Optional[int] = None):
        self.task = task
        self.dm = datamodule
        self.config = config
        cc = config.custom_configs
        self.max_steps = int(max_steps if max_steps is not None
                             else cc.Training.get("max_steps", 200_000))
        self.limit_val_batches = int(
            limit_val_batches if limit_val_batches is not None
            else cc.Training.get("limit_val_batches", 5))
        # PL val_check_interval analogue (int = every N train steps): with
        # the native loader a long epoch otherwise under-validates — and the
        # plateau schedulers only step at validation time.  0/None keeps the
        # reference's per-epoch cadence.
        self.val_check_interval = int(
            val_check_interval if val_check_interval is not None
            else cc.Training.get("val_check_interval", 0)) or None
        self._config_saved = False
        self.num_val_images = int(cc.Logging.get("num_val_images", 1))
        self.log_ndvi = bool(cc.Logging.get("log_ndvi", False))
        self.log_input_stats = bool(cc.Logging.get("log_input_stats", False))
        self.log_every = log_every
        self.seed = seed

        if tpu_section(config).get("debug_nans", False):
            jax.config.update("jax_debug_nans", True)
        # prefetch_depth >= 1 moves batch prep + transfer dispatch onto a
        # producer thread (DeviceFeed) — overlaps uploads with compute on
        # upload-bound links; 0 keeps the inline double-buffered feed
        self.prefetch_depth = int(tpu_section(config).get("prefetch_depth", 0))

        self.mesh = mesh if mesh is not None else create_mesh(("data",))
        self.is_main = jax.process_index() == 0
        project = cc.Logging.get("wandb_project", "nirgan_tpu")
        # reference resume semantics (train.py:67-71): Model.load_checkpoint
        # may be a PATH to the run to resume (the experiment dir, or a
        # .../last | .../best inside it), not just a bool
        lc = cc.Model.get("load_checkpoint")
        self._resume_which, self._resume_dir = "last", None
        if isinstance(lc, str) and lc:
            rd = lc.rstrip("/")
            if os.path.basename(rd) in ("last", "best"):
                self._resume_which = os.path.basename(rd)
                rd = os.path.dirname(rd)
            if not os.path.isdir(os.path.join(rd, self._resume_which)):
                # an explicit path must resume, never silently start fresh
                # in (and overwrite) the old experiment dir
                raise FileNotFoundError(
                    f"load_checkpoint: no '{self._resume_which}' checkpoint "
                    f"under {rd!r}")
            self._resume_dir = rd
            if logdir is None:
                logdir = rd
        if logdir is None:
            t0 = time.time()
            if jax.process_count() > 1:
                # all processes must agree on the experiment/checkpoint dir;
                # int32 second/microsecond parts keep the stamp exact (f32
                # would round to ~2-minute granularity → cross-run collisions)
                from jax.experimental import multihost_utils

                parts = multihost_utils.broadcast_one_to_all(
                    jnp.asarray([int(t0) % (1 << 31),
                                 int((t0 % 1) * 1e6)], jnp.int32))
                t0 = float(parts[0]) + float(parts[1]) * 1e-6
            stamp = datetime.datetime.fromtimestamp(t0).strftime(
                "%Y-%m-%d_%H-%M-%S")
            logdir = os.path.join("logs", project, stamp)
        self.logdir = logdir
        # rank-zero logging, like the reference's PL loggers
        self.logger = ExperimentLogger(logdir, project=project,
                                       enabled=self.is_main)
        self.ckpt = CheckpointManager(logdir, monitor=config.Schedulers.metric,
                                      mode="min")

        sch = config.Schedulers
        # quirk preserved: factor_g/factor_d configured but torch default 0.1
        # is what actually runs in the reference (model/pix2pix.py:488-489)
        self.sched_g = ReduceLROnPlateau(patience=int(sch.patience_g))
        self.sched_d = ReduceLROnPlateau(patience=int(sch.patience_d))
        self.monitor = sch.metric

        self._train_step = task.make_train_step(mesh=self.mesh)
        self._eval_step = task.make_eval_step(mesh=self.mesh)
        self._profile_dir = os.environ.get("NIRGAN_PROFILE_DIR")
        self._preempted = False

        # fail fast on a train batch that cannot divide the mesh — without
        # this, a multi-host run crashes only at its FIRST train step (after
        # compile), or worse trains a full epoch then dies in validation.
        # (Validation batches of any size are fine: shard_batch pads+masks.)
        # Single-process runs never crash — shard_batch's replicated
        # fallback handles uneven batches — so there it is only a perf
        # warning, not an error.
        n_shards = int(self.mesh.shape.get("data", 1))
        local_quota = max(1, n_shards // jax.process_count())
        tb = int(self.dm.train_batch_size)
        if tb % local_quota:
            msg = (f"per-host train batch {tb} does not divide the "
                   f"{n_shards}-way data mesh ({local_quota} local devices); "
                   f"set Data.train_batch_size to a multiple of {local_quota}")
            if jax.process_count() > 1:
                raise ValueError(msg)
            import warnings

            warnings.warn(msg + " — training will run the batch fully "
                          "replicated (correct but wasteful)")

    def _install_preemption_handler(self):
        """TPU preemption arrives as SIGTERM; checkpoint 'last' at the next
        step boundary and exit cleanly so resume picks up where we stopped
        (the reference has no failure handling at all — SURVEY.md §5.3)."""

        def handler(signum, frame):
            self._preempted = True
            print("SIGTERM received — checkpointing at next step boundary")

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            pass  # not in the main thread (e.g. under a test runner)

    def _sync_preemption(self, step_no: int) -> bool:
        """Whether to checkpoint-and-exit now.  Single-process: the local
        SIGTERM flag.  Multi-process: the orbax save is a coordinated
        collective, so a host acting on its local flag alone would block in
        the save while the others keep training — a distributed deadlock.
        All hosts instead agree by all-reducing the flag at a shared cadence
        (every ``log_every`` steps — already a host-sync boundary), and every
        process enters ``ckpt.save`` at the same step."""
        if jax.process_count() <= 1:
            return self._preempted
        if step_no % self.log_every:
            return False
        from jax.experimental import multihost_utils

        flag = multihost_utils.process_allgather(
            np.asarray(self._preempted, np.int32))
        agreed = bool(np.max(flag))
        self._preempted = agreed  # keep set for the epoch-boundary path
        return agreed

    # ----------------------------------------------------------------- state
    def _initial_state(self, image_size: int):
        state = self.task.init_state(seed=self.seed, image_size=image_size)
        cc = self.config.custom_configs
        if cc.Model.get("load_weights_only") and cc.Model.get("weights_path"):
            loaded = self._load_weights(cc.Model.weights_path)
            if "params_g" in loaded:
                state = state.replace(params_g=merge_params(state.params_g,
                                                            loaded["params_g"]))
            if "params_d" in loaded:
                state = state.replace(params_d=merge_params(state.params_d,
                                                            loaded["params_d"]))
            print(f"Loaded (only) weights from: {cc.Model.weights_path}")
        state = replicate(self.mesh, state)
        if cc.Model.get("load_checkpoint"):
            # path-based resume may target a different run dir than logdir
            # (caller passed both) and may name 'best' explicitly; bool True
            # keeps the resume-if-present convenience on this run's dir
            mgr = self.ckpt
            if (self._resume_dir is not None and os.path.abspath(
                    self._resume_dir) != os.path.abspath(self.logdir)):
                mgr = CheckpointManager(self._resume_dir)
            if mgr.has(self._resume_which):
                state = mgr.restore(state, self._resume_which)
                print(f"Resumed full train state ({self._resume_which}) at "
                      f"step {int(jax.device_get(state.step))}")
                # PL's full resume restores lr-scheduler state too
                # (Trainer(resume_from_checkpoint=…), train.py:126); restore
                # the plateau counters saved next to the checkpoints so a
                # preempted run doesn't reset its patience window
                self._load_sched_state(mgr.directory)
        return state

    # plateau-scheduler host state persists next to the checkpoints: a
    # resume that reset best/num_bad would silently restart the patience
    # window (PL stores scheduler state INSIDE the checkpoint, so the
    # counters are kept per checkpoint kind — resuming 'best' must not
    # pick up the counters of a later 'last')
    def _sched_state_path(self, which: str, directory=None):
        return os.path.join(directory or self.logdir,
                            f"sched_state_{which}.json")

    def _save_sched_state(self, which: str = "last"):
        if not self.is_main:
            return
        try:
            import json

            with open(self._sched_state_path(which), "w") as f:
                json.dump({
                    "g": {"best": self.sched_g.best,
                          "num_bad_epochs": self.sched_g.num_bad_epochs,
                          "cooldown_counter": self.sched_g.cooldown_counter},
                    "d": {"best": self.sched_d.best,
                          "num_bad_epochs": self.sched_d.num_bad_epochs,
                          "cooldown_counter": self.sched_d.cooldown_counter},
                }, f)
        except Exception as e:  # never kill training over bookkeeping
            print("sched-state save failed:", e)

    def _load_sched_state(self, directory):
        try:
            import json

            path = self._sched_state_path(self._resume_which, directory)
            if not os.path.exists(path):
                # pre-round-5 runs wrote one un-suffixed file
                legacy = os.path.join(directory, "sched_state.json")
                if not os.path.exists(legacy):
                    return
                path = legacy
            with open(path) as f:
                blob = json.load(f)
            for sched, key in ((self.sched_g, "g"), (self.sched_d, "d")):
                s = blob.get(key, {})
                sched.best = s.get("best", sched.best)
                sched.num_bad_epochs = int(s.get("num_bad_epochs", 0))
                sched.cooldown_counter = int(s.get("cooldown_counter", 0))
            print(f"Restored plateau-scheduler state from {path}")
        except Exception as e:
            print("sched-state restore failed:", e)

    def _load_weights(self, path: str) -> dict:
        if path.endswith((".ckpt", ".pt", ".pth")):
            return self.task.load_torch_weights(path)
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
        return {k: restored[k] for k in ("params_g", "params_d") if k in restored}

    # ------------------------------------------------------------------ fit
    def fit(self, state=None):
        sample = self.dm.train_ds[0]
        image_size = sample["rgb"].shape[-1]
        if state is None:
            state = self._initial_state(image_size)
        self._install_preemption_handler()

        prepare = lambda b: shard_batch(self.mesh, self.task.extract_batch(b))
        step_no = int(jax.device_get(state.step))
        epoch = 0
        t_window, n_window = time.perf_counter(), 0
        batch_images = self.dm.train_batch_size

        while step_no < self.max_steps:
            for ex in DeviceFeed(self.dm.train_dataloader(), prepare,
                                 depth=self.prefetch_depth):
                if self._profile_dir and step_no == 10:
                    try:
                        jax.profiler.start_trace(self._profile_dir)
                    except Exception as e:  # backend may not support tracing
                        print("profiler trace unavailable:", e)
                        self._profile_dir = None
                state, metrics = self._train_step(state, ex)
                step_no += 1
                n_window += batch_images
                if self._profile_dir and step_no == 20:
                    try:
                        jax.profiler.stop_trace()
                    except Exception as e:
                        print("profiler stop failed:", e)
                    self._profile_dir = None

                if step_no % self.log_every == 0:
                    # one host pull for everything — per-scalar device_get
                    # costs a tunnel/PCIe round trip each (~15 scalars/log)
                    pulled = jax.device_get((metrics, state.lr_g, state.lr_d))
                    m = {k: float(v) for k, v in pulled[0].items()}
                    if not np.isfinite(m["model_loss/generator_total_loss"]):
                        raise RuntimeError(
                            f"non-finite generator loss at step {step_no}: {m}")
                    # NaN marks metrics skipped by the train-metric cadence
                    # (task.train_metrics_every) — drop those; other keys
                    # (loss terms) stay visible even if non-finite
                    m = {k: v for k, v in m.items()
                         if np.isfinite(v) or not k.startswith("train/")}
                    dt = time.perf_counter() - t_window
                    m["perf/images_per_sec"] = n_window / max(dt, 1e-9)
                    m["perf/step_ms"] = 1000.0 * dt / max(n_window / batch_images, 1)
                    m["lr/G"], m["lr/D"] = float(pulled[1]), float(pulled[2])
                    self.logger.log_metrics(m, step_no)
                    t_window, n_window = time.perf_counter(), 0
                if (self.val_check_interval
                        and step_no % self.val_check_interval == 0):
                    state = self._run_validation(state, epoch + 1, step_no)
                if self._sync_preemption(step_no):
                    self.ckpt.save(state, {})
                    self._save_sched_state("last")
                    print(f"preemption checkpoint written at step {step_no}")
                    return state
                if step_no >= self.max_steps:
                    break

            epoch += 1
            if not self.val_check_interval:
                state = self._run_validation(state, epoch, step_no)

        return state

    # ----------------------------------------------------------- validation
    def _run_validation(self, state, epoch: int, step_no: int):
        agg: dict = {}
        n_batches = 0
        for i, batch in enumerate(self.dm.val_dataloader()):
            if i >= self.limit_val_batches:
                break
            # pad+mask uneven val batches (reference val batch 5) so val work
            # splits over the mesh instead of running fully replicated
            ex = shard_batch(self.mesh, self.task.extract_batch(batch),
                             pad_uneven=True)
            pred, metrics = self._eval_step(state, ex)
            for k, v in jax.device_get(metrics).items():  # one pull per batch
                agg[k] = agg.get(k, 0.0) + float(v)
            n_batches += 1
            if i < self.num_val_images:
                self._log_val_images(batch, pred, ex, step_no)
        if n_batches == 0:
            return state
        val = {k: v / n_batches for k, v in agg.items()}
        val["epoch"] = epoch
        self.logger.log_metrics(val, step_no)

        # config snapshot at the first validation (reference saves at epoch 1,
        # model/pix2pix.py:321-324; with step-cadence validation "epoch 1" may
        # be hours away, so first-validation is the faithful generalisation)
        if not self._config_saved and self.is_main:
            try:
                save_config(self.config, os.path.join(self.logdir, "config.yaml"))
                self._config_saved = True
            except Exception as e:  # best-effort, like the reference
                print("Error in saving config to experiment path:", e)

        # plateau scheduling on the monitored metric
        monitored = val.get(self.monitor)
        if monitored is not None:
            cur_g, cur_d = jax.device_get((state.lr_g, state.lr_d))
            new_g = self.sched_g.step(monitored, float(cur_g))
            new_d = self.sched_d.step(monitored, float(cur_d))
            # replicate() (not device_put) — multi-process meshes reject
            # device_put to non-addressable shardings
            if (new_g != float(cur_g) or new_d != float(cur_d)) and self.is_main:
                print(f"ReduceLROnPlateau: lr G {float(cur_g):.2e}->{new_g:.2e}"
                      f" D {float(cur_d):.2e}->{new_d:.2e} at step {step_no}")
            state = state.replace(
                lr_g=replicate(self.mesh, jnp.asarray(new_g, jnp.float32)),
                lr_d=replicate(self.mesh, jnp.asarray(new_d, jnp.float32)))

        # sched state AFTER the checkpoints so a crash between the two
        # leaves the previous consistent pair; 'best' counters are written
        # only when this validation produced a new best checkpoint
        improved = self.ckpt.save(state, val)
        if monitored is not None:
            self._save_sched_state("last")
            if improved:
                self._save_sched_state("best")

        # best-effort offline geo-validation (never kills training,
        # reference model/pix2pix.py:329-344)
        if (self.is_main and self.config.custom_configs
                .get("experimentation", {}).get("save_val_df")):
            try:
                if epoch >= 1:
                    from nirgan_tpu.validation.spider import spider_validation_callback

                    self.task.bind(jax.device_get(state.params_g))
                    spider_validation_callback(
                        self.task, self.dm.val_ds, satclip=self.task.satclip,
                        folder=self.logdir, epoch_no=epoch)
            except Exception as e:
                print("Error in spider callback validation and saving:", e)
        return state

    def _log_val_images(self, batch, pred, ex, step_no):
        if not self.is_main:
            return
        try:
            from nirgan_tpu.utils.logging_helpers import plot_index, plot_tensors_hist

            rgb = np.asarray(batch["rgb"], np.float32)[:, :3]
            nir = np.asarray(batch["nir"], np.float32)
            if jax.process_count() > 1:
                # pred spans hosts; this host's shards cover its own `batch`
                # slice (make_array_from_process_local_data layout), but
                # addressable_shards iteration order is NOT globally sorted —
                # order shards by their global row start and map each back to
                # the matching local batch rows
                shards = sorted(pred.addressable_shards,
                                key=lambda s: s.index[0].start or 0)
                starts = [s.index[0].start or 0 for s in shards]
                local0 = starts[0]
                rows = np.concatenate([
                    np.arange(st - local0, st - local0 + s.data.shape[0])
                    for st, s in zip(starts, shards)])
                pred_local = np.concatenate(
                    [np.asarray(s.data) for s in shards])
                keep = rows < len(rgb)  # drop pad rows (pad_uneven batches)
                rgb, nir = rgb[rows[keep]], nir[rows[keep]]
                pred_nchw = np.transpose(pred_local[keep], (0, 3, 1, 2))
            else:
                pred_nchw = np.transpose(
                    np.asarray(jax.device_get(pred))[:len(rgb)], (0, 3, 1, 2))
            self.logger.log_image("Images/Val NIR",
                                  plot_tensors_hist(rgb, nir, pred_nchw), step_no)
            if self.log_ndvi:
                self.logger.log_image("Images/Val NDVI",
                                      plot_index(rgb, nir, pred_nchw), step_no)
            if self.log_input_stats:
                self.logger.log_metrics({
                    "val_stats/min_pred": pred_nchw.min(),
                    "val_stats/max_pred": pred_nchw.max(),
                    "val_stats/mean_pred": pred_nchw.mean(),
                    "val_stats/min_input": nir.min(),
                    "val_stats/max_input": nir.max(),
                    "val_stats/mean_input": nir.mean(),
                }, step_no)
            if self.task.lambda_rs > 0.0 and self.task.rs_losses is not None:
                from nirgan_tpu.tasks.px2px import nchw_to_nhwc

                d = self.task.rs_losses.get_and_weight_losses(
                    nchw_to_nhwc(rgb), nchw_to_nhwc(nir),
                    nchw_to_nhwc(pred_nchw), mode="logging_dict")
                self.logger.log_metrics(d, step_no)
        except Exception as e:
            print("Error in validation image logging:", e)
