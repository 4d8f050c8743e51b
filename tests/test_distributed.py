"""True multi-process data parallelism: 2 CPU processes under
``jax.distributed.initialize`` (the reference's torch.distributed.launch +
DDP/NCCL equivalent, train_stereo.py:275-292), driving the exact code a pod
run depends on — ``initialize_distributed``, ``global_batch_from_local``,
``Trainer.make_batch``'s multi-shard branch and ``process_rng_key`` — and
asserting the resulting loss matches a single-process 2-device run of the
same global batch."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("dist")
    port = _free_port()
    coord = f"localhost:{port}"
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    for pid in range(2):
        out = str(out_dir / f"result_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/distributed_worker.py"),
             coord, "2", str(pid), out],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_loss_agrees_and_matches_single_process(worker_results):
    r0, r1 = worker_results
    # the loss is a global (all-reduced) scalar: identical on both processes
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert np.isfinite(r0["loss"])
    # per-process RNG keys must differ (reference per-rank seed 1234+rank)
    assert r0["rng"] != r1["rng"]

    # single-process reference: same global batch on a 2-device local mesh
    import jax

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.data.loader import SequenceLoader
    from tcs_tpu.data.synthetic import SyntheticStereoSequence
    from tcs_tpu.train import make_train_step
    from tcs_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        batch_size=1, image_size=(32, 64), frame_length=1, train_iters=1,
        num_steps=4, lr=1e-4, num_workers=1,
        checkpoint_dir="/tmp/tcs_dist_ckpt_single",
        model=ModelConfig(mixed_precision=False),
    )
    trainer = Trainer(cfg, devices=jax.devices()[:2])
    ds = SyntheticStereoSequence(n_samples=8, frame_length=1, height=32,
                                 width=64)
    # one loader over the FULL global batch (the strided shard split of the
    # same seed/epoch yields rows [perm[0], perm[1]] across the 2 processes)
    loader = SequenceLoader(ds, batch_size=2, seed=0, num_workers=1)
    ts = trainer.init_state()
    step = make_train_step(trainer.model, cfg, donate=False)
    batch = trainer.make_batch(next(iter(loader)))
    ts, metrics = step(ts, batch)
    loss_single = float(np.asarray(metrics["live_loss"]))
    assert r0["loss"] == pytest.approx(loss_single, rel=2e-4), (
        r0["loss"], loss_single)


@pytest.fixture(scope="module")
def worker_results_2x4(tmp_path_factory):
    """2 processes x 4 local devices each — the real TPU-host topology
    (several chips per host process), vs the 1-device-per-process fixture
    above. Exercises make_batch/global_batch_from_local with multi-device
    LOCAL shards across a process boundary."""
    out_dir = tmp_path_factory.mktemp("dist2x4")
    port = _free_port()
    coord = f"localhost:{port}"
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["TCS_LOCAL_DEVICES"] = "4"
    for pid in range(2):
        out = str(out_dir / f"result_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/distributed_worker.py"),
             coord, "2", str(pid), out],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_four_device_matches_single_process(worker_results_2x4):
    """DDP shape parity beyond one-device-per-process (reference: one
    process per GPU, train_stereo.py:275-292; a TPU host runs one process
    for SEVERAL local chips): the 2x4 global batch of 8 rows must produce
    the same all-reduced loss on both processes AND match a single-process
    8-device run of the same rows."""
    r0, r1 = worker_results_2x4
    assert r0["global_rows"] == r1["global_rows"] == 8
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert np.isfinite(r0["loss"])
    assert r0["rng"] != r1["rng"]  # per-process fold unaffected by topology

    import jax

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.data.loader import SequenceLoader
    from tcs_tpu.data.synthetic import SyntheticStereoSequence
    from tcs_tpu.train import make_train_step
    from tcs_tpu.train.trainer import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TrainConfig(
        batch_size=1, image_size=(32, 64), frame_length=1, train_iters=1,
        num_steps=4, lr=1e-4, num_workers=1,
        checkpoint_dir="/tmp/tcs_dist_ckpt_single8",
        model=ModelConfig(mixed_precision=False),
    )
    trainer = Trainer(cfg, devices=jax.devices()[:8])
    ds = SyntheticStereoSequence(n_samples=8, frame_length=1, height=32,
                                 width=64)
    # The 2-shard strided split hands process p rows perm[p::2]; a single
    # loader over the full batch yields the same 8-row set (order differs,
    # which only permutes the all-reduce summands).
    loader = SequenceLoader(ds, batch_size=8, seed=0, num_workers=1)
    ts = trainer.init_state()
    step = make_train_step(trainer.model, cfg, donate=False)
    batch = trainer.make_batch(next(iter(loader)))
    assert batch.image1.shape[0] == 8
    ts, metrics = step(ts, batch)
    loss_single = float(np.asarray(metrics["live_loss"]))
    assert r0["loss"] == pytest.approx(loss_single, rel=2e-4), (
        r0["loss"], loss_single)


@pytest.fixture(scope="module")
def train_worker_results(tmp_path_factory):
    """Run the FULL Trainer.train() driver under 2 jax.distributed
    processes: loader sharding, collective Orbax checkpointing mid-run, and
    a fresh-Trainer resume that continues to the target step."""
    out_dir = tmp_path_factory.mktemp("dist_train")
    shared_ckpt = str(out_dir / "ckpts")
    port = _free_port()
    coord = f"localhost:{port}"
    procs, outs = [], []
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    for pid in range(2):
        out = str(out_dir / f"result_{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/distributed_worker.py"),
             coord, "2", str(pid), out, "train", shared_ckpt],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            log, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(log)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"train worker failed:\n{log[-4000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_trainer_train_with_resume(train_worker_results):
    r0, r1 = train_worker_results
    # phase 1 stopped at step 2; the fresh Trainer found and resumed the
    # step-2 checkpoint (params + opt_state + step) and finished at step 4
    for r in (r0, r1):
        assert r["step_phase1"] == 2, r
        assert r["resumed_at"] == 2, r
        assert r["final_step"] == 4, r
    # the trained parameters are a global all-reduced quantity: identical
    # across processes, as is the probe loss on the shared probe batch
    assert r0["param_checksum"] == pytest.approx(r1["param_checksum"],
                                                 rel=1e-9)
    assert r0["probe_loss"] == pytest.approx(r1["probe_loss"], rel=1e-6)
    assert np.isfinite(r0["probe_loss"])


def test_two_process_trainer_matches_single_process(train_worker_results):
    """The 2-process 4-step Trainer.train() trajectory (incl. mid-run
    checkpoint + resume) must land on the same parameters as a
    single-process 2-device run of the same global batches."""
    import jax

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.data.loader import SequenceLoader
    from tcs_tpu.data.synthetic import SyntheticStereoSequence
    from tcs_tpu.train import make_train_step
    from tcs_tpu.train.trainer import Trainer

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg = TrainConfig(
            batch_size=1, image_size=(32, 64), frame_length=1, train_iters=1,
            num_steps=4, lr=1e-4, num_workers=1, validation_frequency=2,
            checkpoint_dir=td, name="dist_train_single",
            model=ModelConfig(mixed_precision=False),
        )
        ds = SyntheticStereoSequence(n_samples=8, frame_length=1, height=32,
                                     width=64)
        # Mirror the workers' two-phase structure: a resumed run restarts
        # its loader epoch (exactly like the reference's sampler on
        # restore), so phase boundaries are part of the trajectory.
        t1 = Trainer(cfg, devices=jax.devices()[:2])
        ts = t1.train(max_steps=2, dataset=ds)
        assert int(ts.step) == 2
        trainer = Trainer(cfg, devices=jax.devices()[:2])
        assert trainer.ckpt.latest_step() == 2
        ts = trainer.train(max_steps=4, dataset=ds)
        assert int(ts.step) == 4

        probe_loader = SequenceLoader(ds, batch_size=2, seed=123,
                                      num_workers=1)
        step_fn = make_train_step(trainer.model, cfg, donate=False)
        _, metrics = step_fn(ts, trainer.make_batch(next(iter(probe_loader))))
        probe_single = float(np.asarray(metrics["live_loss"]))
        checksum_single = float(sum(
            np.float64(np.sum(np.abs(np.asarray(x))))
            for x in jax.tree_util.tree_leaves(ts.params)
        ))

    r0 = train_worker_results[0]
    assert r0["param_checksum"] == pytest.approx(checksum_single, rel=1e-5), (
        r0["param_checksum"], checksum_single)
    # The probe loss is evaluated AFTER a 4-step training trajectory whose
    # per-step fp reassociation differs between the 2-process and
    # single-process topologies (reduction/collective order); the inline
    # backward's per-frame accumulation shifts that noise slightly (round 5:
    # rel ~1.1e-3 where the scan formulation sat under 2e-4). Single-STEP
    # topology equivalence stays pinned at rel 2e-4 by
    # test_two_process_loss_agrees… and the 2x4 variant above; here the
    # trajectory-level bound is correspondingly looser.
    assert r0["probe_loss"] == pytest.approx(probe_single, rel=5e-3), (
        r0["probe_loss"], probe_single)
