"""Training driver (reference ``train_stereo.py:272-450``).

Orchestrates: dataset/loader construction, device mesh + DP sharding, the
jitted frame-scan train step, periodic validation, checkpointing with full
resume, and metric logging. The per-frame Python loop, GradScaler and manual
gradient accumulation of the reference collapse into one compiled step (see
``train_step.py``); AMP is replaced by the bf16 compute policy baked into the
model.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tcs_tpu.config import TrainConfig
from tcs_tpu.data.datasets import fetch_dataset
from tcs_tpu.data.loader import SequenceLoader
from tcs_tpu.models import CameraParams, TCStereo, TemporalState
from tcs_tpu.parallel import mesh as mesh_lib
from tcs_tpu.train.optim import make_optimizer
from tcs_tpu.train.train_step import SequenceBatch, TrainState, make_train_step
from tcs_tpu.utils.checkpoint import CheckpointManager
from tcs_tpu.utils.logging_utils import MetricsLogger

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, cfg: TrainConfig, use_wandb: bool = False,
                 debug_nans: bool = False, devices=None):
        self.cfg = cfg
        self.model = TCStereo(cfg=cfg.model)
        if debug_nans:
            from tcs_tpu.utils.debug import enable_nan_checks

            enable_nan_checks(True)
        self.devices = list(devices) if devices is not None else jax.devices()
        self.mesh = mesh_lib.create_mesh(self.devices)
        self.n_shards = jax.process_count()
        self.global_batch = cfg.batch_size * len(self.devices)
        self.ckpt = CheckpointManager(
            os.path.join(cfg.checkpoint_dir, cfg.name)
        )
        self.logger = MetricsLogger(
            sum_freq=100, frame_length=cfg.frame_length, use_wandb=use_wandb,
            jsonl_path=os.path.join(cfg.checkpoint_dir, f"{cfg.name}_metrics.jsonl"),
        )

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        cfg = self.cfg
        H, W = cfg.image_size
        B = 1  # shapes don't matter for init beyond channel structure
        rng = jax.random.PRNGKey(cfg.seed)
        cam = CameraParams(
            K=jnp.eye(3)[None] * jnp.asarray([[100.0], [100.0], [1.0]]),
            baseline=jnp.ones((B,)),
        )
        state0 = TemporalState.zeros(B, H, W, cfg.model)
        params = self.model.init(
            rng, jnp.zeros((B, H, W, 3)), jnp.zeros((B, H, W, 3)), state0,
            cam, jnp.eye(4)[None], iters=cfg.train_iters, test_mode=False,
        )
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info("Parameter count: %d", n_params)
        tx = make_optimizer(cfg)
        ts = TrainState.create(apply_fn=self.model.apply, params=params, tx=tx)

        if cfg.restore_ckpt:
            mgr = CheckpointManager(cfg.restore_ckpt)
            params = mgr.restore_params_only(ts.params)
            ts = ts.replace(params=params)
            logger.info("Restored weights from %s", cfg.restore_ckpt)
        elif self.ckpt.latest_step() is not None:
            # Restore to HOST arrays before replicating: restored leaves are
            # committed to the local default device, and device_put from a
            # committed single-device array onto a multi-process global
            # sharding would need a cross-host transfer (unsupported on the
            # CPU backend; wasteful on TPU). Host→global uploads are the
            # supported path — each process feeds its local shard.
            ts = jax.tree_util.tree_map(np.asarray, self.ckpt.restore(ts))
            logger.info("Resumed full training state at step %d",
                        int(ts.step))
        return mesh_lib.replicate(ts, self.mesh)

    # ------------------------------------------------------------------
    def make_batch(self, np_batch) -> SequenceBatch:
        """numpy dict → device-sharded SequenceBatch."""
        arrays = SequenceBatch(
            image1=np_batch["image1"], image2=np_batch["image2"],
            flow=np_batch["flow"], valid=np_batch["valid"], T=np_batch["T"],
            K=np_batch["K"], baseline=np_batch["baseline"],
        )
        if self.n_shards > 1:
            return mesh_lib.global_batch_from_local(arrays, self.mesh)
        return mesh_lib.shard_batch(arrays, self.mesh)

    # ------------------------------------------------------------------
    def train(self, max_steps: Optional[int] = None,
              dataset=None, validate_fn=None) -> TrainState:
        cfg = self.cfg
        num_steps = max_steps or cfg.num_steps
        ts = self.init_state()
        train_step = make_train_step(self.model, cfg)

        dataset = dataset if dataset is not None else fetch_dataset(cfg)
        # Per-process shard of the global batch (DistributedSampler analogue).
        loader = SequenceLoader(
            dataset,
            batch_size=cfg.batch_size * (len(self.devices)
                                         // jax.process_count()),
            seed=cfg.seed,
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
            num_workers=cfg.num_workers,
        )

        total_steps = int(ts.step)
        epoch = 0
        t_start = time.time()

        # Preemption handling: checkpoint on SIGTERM, then exit cleanly (the
        # Orbax full-state resume picks up at the same step).
        import signal

        preempted = {"flag": False}

        def _on_sigterm(signum, frame):
            preempted["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not in main thread
            prev_handler = None

        from tcs_tpu.utils.debug import FailureDetector

        detector = FailureDetector(patience=3)

        with self.mesh:
            while total_steps < num_steps:
                epoch += 1
                loader.set_epoch(epoch)
                for np_batch in loader:
                    batch = self.make_batch(np_batch)
                    ts, metrics = train_step(ts, batch)
                    self.logger.push(metrics)
                    total_steps += 1
                    healthy = detector.update(metrics)
                    if not healthy:
                        logger.error(
                            "divergence detected at step %d; restoring last "
                            "checkpoint", total_steps)
                        if self.ckpt.latest_step() is not None:
                            ts = mesh_lib.replicate(
                                jax.tree_util.tree_map(
                                    np.asarray,
                                    self.ckpt.restore(
                                        jax.tree_util.tree_map(np.asarray, ts)
                                    ),
                                ),
                                self.mesh,
                            )
                        detector.consecutive_bad = 0
                    if preempted["flag"]:
                        logger.warning("SIGTERM received: checkpointing at "
                                       "step %d and exiting", total_steps)
                        # Collective save: every process calls it (Orbax
                        # coordinates and the primary host writes) — calling
                        # from process 0 alone would deadlock Orbax's
                        # cross-process barriers under jax.distributed.
                        self.ckpt.save(total_steps, ts, wait=True)
                        if prev_handler is not None:
                            signal.signal(signal.SIGTERM, prev_handler)
                        return ts

                    if total_steps % cfg.validation_frequency == cfg.validation_frequency - 1:
                        # Never checkpoint an unhealthy state: a NaN/diverged
                        # save would poison the divergence-restore path (and
                        # resume). Only states with a clean detector record
                        # since the last bad step are persisted. The save is
                        # COLLECTIVE (all processes call; Orbax's primary
                        # host writes) — the health predicate is global
                        # (all-reduced metrics), so every process takes the
                        # same branch.
                        if healthy and detector.consecutive_bad == 0:
                            self.ckpt.save(total_steps, ts)
                        if validate_fn is not None:
                            results = validate_fn(self.model, ts.params,
                                                  cfg.model)
                            self.logger.write_dict(results)
                    if total_steps >= num_steps:
                        break
        self.ckpt.save(int(ts.step), ts, wait=True)  # collective
        logger.info("FINISHED TRAINING (%d steps, %.1f s)", total_steps,
                    time.time() - t_start)
        return ts
