"""Worker process for the 2-process jax.distributed test
(tests/test_distributed.py). Runs the REAL multi-host code path on CPU:
``initialize_distributed`` → global mesh over both processes' devices →
``Trainer.make_batch``'s ``global_batch_from_local`` branch → one jitted
train step whose gradient all-reduce crosses the process boundary →
``process_rng_key``. Writes a JSON result for the parent test to compare
against a single-process run of the same global batch.

Usage: python tests/distributed_worker.py <coord> <nproc> <pid> <out.json>
           [mode] [shared_dir]

mode 'step' (default): one train step, loss/rng comparison.
mode 'train': the FULL ``Trainer.train()`` driver — loader sharding,
collective Orbax checkpointing mid-run, a second Trainer that RESUMES from
the saved state and continues, and a deterministic probe loss + parameter
checksum for the parent test to compare against a single-process run.
``shared_dir`` is the checkpoint directory shared by both processes.
"""

import json
import os
import sys


def _train_mode(out_path, shared_dir):
    """Full Trainer.train() under jax.distributed (VERDICT round-3 ask #6)."""
    import jax
    import numpy as np

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.data.loader import SequenceLoader
    from tcs_tpu.data.synthetic import SyntheticStereoSequence
    from tcs_tpu.train import make_train_step
    from tcs_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        batch_size=1, image_size=(32, 64), frame_length=1, train_iters=1,
        num_steps=4, lr=1e-4, num_workers=1, validation_frequency=2,
        checkpoint_dir=shared_dir, name="dist_train",
        model=ModelConfig(mixed_precision=False),
    )
    ds = SyntheticStereoSequence(n_samples=8, frame_length=1, height=32,
                                 width=64)

    # Phase 1: train 2 steps; validation_frequency=2 saves at step 1 and the
    # final collective save persists step 2.
    t1 = Trainer(cfg)
    ts = t1.train(max_steps=2, dataset=ds)
    step_phase1 = int(ts.step)

    # Phase 2: a FRESH Trainer must resume from the shared checkpoint (full
    # Orbax state: params + opt_state + step) and continue to step 4.
    t2 = Trainer(cfg)
    resumed_at = t2.ckpt.latest_step()
    ts2 = t2.train(max_steps=4, dataset=ds)

    # Deterministic probes for cross-process + single-process comparison.
    probe_loader = SequenceLoader(ds, batch_size=2, seed=123, num_workers=1)
    step_fn = make_train_step(t2.model, cfg, donate=False)
    batch = t2.make_batch(next(iter(probe_loader))) if t2.n_shards == 1 else None
    if batch is None:
        # each process feeds its shard of the SAME probe rows
        shard_loader = SequenceLoader(
            ds, batch_size=1, seed=123, shard_id=jax.process_index(),
            num_shards=jax.process_count(), num_workers=1)
        batch = t2.make_batch(next(iter(shard_loader)))
    _, metrics = step_fn(ts2, batch)
    checksum = float(sum(
        np.float64(np.sum(np.abs(np.asarray(x))))
        for x in jax.tree_util.tree_leaves(ts2.params)
    ))
    result = {
        "process": jax.process_index(),
        "step_phase1": step_phase1,
        "resumed_at": resumed_at,
        "final_step": int(ts2.step),
        "probe_loss": float(np.asarray(metrics["live_loss"])),
        "param_checksum": checksum,
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print("train worker", jax.process_index(), "done:", result, flush=True)


def main():
    coord, nproc, pid, out_path = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    # TCS_LOCAL_DEVICES > 1 reproduces the real TPU-host topology (several
    # local devices per process) so global_batch_from_local / make_batch run
    # with multi-device local shards across a process boundary.
    ndev_local = int(os.environ.get("TCS_LOCAL_DEVICES", "1"))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev_local}")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcs_tpu_jax_cache")

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np

    from tcs_tpu.parallel.mesh import initialize_distributed, process_rng_key

    initialize_distributed(coord, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.local_devices()) == ndev_local
    assert len(jax.devices()) == int(nproc) * ndev_local

    if mode == "train":
        _train_mode(out_path, sys.argv[6])
        return

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.data.loader import SequenceLoader
    from tcs_tpu.data.synthetic import SyntheticStereoSequence
    from tcs_tpu.train import make_train_step
    from tcs_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        batch_size=1, image_size=(32, 64), frame_length=1, train_iters=1,
        num_steps=4, lr=1e-4, num_workers=1,
        checkpoint_dir=f"/tmp/tcs_dist_ckpt_{pid}",
        model=ModelConfig(mixed_precision=False),
    )
    trainer = Trainer(cfg)
    assert trainer.n_shards == int(nproc)

    ds = SyntheticStereoSequence(n_samples=8, frame_length=1, height=32,
                                 width=64)
    # per-process rows = per-shard batch x local devices (the loader shape
    # Trainer.train uses)
    loader = SequenceLoader(ds, batch_size=cfg.batch_size * ndev_local,
                            seed=0, shard_id=jax.process_index(),
                            num_shards=jax.process_count(), num_workers=1)
    ts = trainer.init_state()
    step = make_train_step(trainer.model, cfg, donate=False)
    np_batch = next(iter(loader))
    batch = trainer.make_batch(np_batch)  # global_batch_from_local branch
    # global batch spans processes x local devices
    assert batch.image1.shape[0] == int(nproc) * ndev_local * cfg.batch_size
    ts, metrics = step(ts, batch)

    key = process_rng_key(jax.random.PRNGKey(0))
    result = {
        "process": int(pid),
        "global_rows": int(batch.image1.shape[0]),
        "loss": float(np.asarray(metrics["live_loss"])),
        "epe": float(np.asarray(metrics["epe"])),
        "rng": np.asarray(jax.random.key_data(key)).tolist(),
        "local_rows_index": int(np_batch["_index"][0]) if "_index" in np_batch
        else None,
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print("worker", pid, "done:", result, flush=True)


if __name__ == "__main__":
    main()
