#!/usr/bin/env python
"""TPU soak of the production ``Trainer.train()`` driver (VERDICT round-4
ask #6): several hundred real optimizer steps on synthetic data ON the TPU,
with the divergence detector armed, one mid-run SIGTERM preemption (the
trainer checkpoints collectively and exits cleanly) and a fresh-Trainer
resume that continues to the target step. Writes ``docs/soak_tpu.md`` with
the loss trajectory and the resume event.

Everything on-chip before this was a ≤6-step bench or a jitted-step test;
this is the end-to-end proof that the driver — loader threads, device
upload, jitted step, metrics flushes, Orbax saves, signal handling — holds
up on real hardware for a sustained run.

Usage:
  python scripts/soak_tpu.py                 # orchestrates both phases
  python scripts/soak_tpu.py --child ...     # internal (one Trainer run)

Reference analogue: the 100k-step ``tartanair_ddp_train.sh`` recipe; shapes
here are reduced (b2 256x320 fl2) so the soak finishes in minutes while
still exercising the full driver.
"""

import argparse
import json
import os
import os.path as osp
import signal
import subprocess
import sys
import time

sys.path.insert(0, ".")

STEPS = 400
PREEMPT_AFTER_S = 60.0


def child(args):
    import logging

    logging.basicConfig(level=logging.INFO)

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.data.synthetic import SyntheticStereoSequence
    from tcs_tpu.train.trainer import Trainer
    from tcs_tpu.utils.logging_utils import MetricsLogger

    cfg = TrainConfig(
        name="soak", checkpoint_dir=args.workdir,
        batch_size=2, image_size=(256, 320), frame_length=2, train_iters=5,
        num_steps=STEPS, lr=2e-4, num_workers=2,
        validation_frequency=100,  # checkpoint cadence (saves at step 99, …)
        model=ModelConfig(),
    )
    ds = SyntheticStereoSequence(n_samples=64, frame_length=2, height=256,
                                 width=320, layered_frac=0.5)
    t = Trainer(cfg)
    # deterministic resume marker (independent of logging config)
    print(f"SOAK_RESUMED_AT step={t.ckpt.latest_step()}", flush=True)
    # denser jsonl trajectory than the production sum_freq=100;
    # frame_length=1 so the jsonl 'step' field counts optimizer steps
    t.logger = MetricsLogger(
        sum_freq=20, frame_length=1,
        jsonl_path=osp.join(args.workdir, "soak_metrics.jsonl"))
    ts = t.train(dataset=ds)
    print(f"SOAK_CHILD_DONE step={int(ts.step)}", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--child", action="store_true")
    p.add_argument("--workdir", default="/tmp/tcs_soak")
    p.add_argument("--out", default="docs/soak_tpu.md")
    args = p.parse_args()
    if args.child:
        child(args)
        return

    # fresh workdir: a stale step-400 checkpoint would make phase 1 resume
    # at the target step and exit immediately
    import shutil

    if osp.isdir(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcs_tpu_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
    cmd = [sys.executable, "scripts/soak_tpu.py", "--child",
           "--workdir", args.workdir]

    # Phase 1: train until we SIGTERM it mid-run (after the first compile +
    # some steps). The trainer's handler checkpoints and exits cleanly.
    print(f"phase 1: starting; SIGTERM after {PREEMPT_AFTER_S}s of steps")
    t0 = time.time()
    p1 = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    jsonl = osp.join(args.workdir, "soak_metrics.jsonl")
    # wait until the first metrics flush proves stepping started
    while True:
        if p1.poll() is not None:
            out = p1.stdout.read()
            sys.exit(f"phase-1 exited before stepping:\n{out[-4000:]}")
        if osp.exists(jsonl) and os.path.getsize(jsonl) > 0:
            break
        time.sleep(2)
    print(f"stepping confirmed after {time.time() - t0:.0f}s; letting it "
          f"run {PREEMPT_AFTER_S}s before preempting")
    time.sleep(PREEMPT_AFTER_S)
    p1.send_signal(signal.SIGTERM)
    out1, _ = p1.communicate(timeout=600)
    assert p1.returncode == 0, f"phase-1 SIGTERM exit dirty:\n{out1[-4000:]}"
    assert "SIGTERM received: checkpointing" in out1, out1[-4000:]
    preempt_line = [l for l in out1.splitlines()
                    if "SIGTERM received" in l][0]
    print("phase 1 preempted cleanly:", preempt_line.strip())

    # Phase 2: fresh process, fresh Trainer — must resume from the SIGTERM
    # checkpoint and continue to STEPS.
    t1 = time.time()
    p2 = subprocess.run(cmd, env=env, stdout=subprocess.PIPE,
                        stderr=subprocess.STDOUT, text=True, timeout=3600)
    assert p2.returncode == 0, f"phase-2 failed:\n{p2.stdout[-4000:]}"
    out2 = p2.stdout
    assert f"SOAK_CHILD_DONE step={STEPS}" in out2, out2[-2000:]
    resume_line = [l for l in out2.splitlines()
                   if l.startswith("SOAK_RESUMED_AT")][0]
    resumed_at = int(resume_line.split("=")[1])
    assert 0 < resumed_at < STEPS, resume_line  # resumed mid-run, not fresh
    print("phase 2 resumed + finished:", resume_line.strip())

    rows = [json.loads(l) for l in open(jsonl)]
    # phase 2's MetricsLogger restarts its push counter at the resumed
    # step: re-offset the step fields into one global axis
    losses, offset, prev = [], 0, -1
    for r in rows:
        if "live_loss" not in r:
            continue
        if r["step"] <= prev - offset:
            offset = resumed_at
        prev = offset + r["step"]
        losses.append((prev, r["live_loss"]))
    first, last = losses[0], losses[-1]
    drop = first[1] / max(last[1], 1e-9)
    dur2 = time.time() - t1

    md = [
        "# TPU soak: production `Trainer.train()` end-to-end",
        "",
        f"Generated by `scripts/soak_tpu.py` on {time.strftime('%Y-%m-%d')}"
        f" (device: real TPU via the default runtime).",
        "",
        f"- {STEPS} optimizer steps, b2 256x320 fl2 iters5, synthetic"
        " two-plane scenes (layered_frac=0.5), loader threads=2",
        "- divergence detector armed (FailureDetector patience=3);"
        " periodic collective Orbax saves every 100 steps",
        f"- **preemption event**: `{preempt_line.strip()}` — SIGTERM"
        " mid-run, trainer checkpointed collectively and exited 0",
        f"- **resume event**: `{resume_line.strip()}` — a FRESH process +"
        f" Trainer picked up the full Orbax state at step {resumed_at} and"
        f" ran to step {STEPS} (phase-2 wall {dur2:.0f}s incl. compile)",
        "",
        "## Loss trajectory (jsonl flushes, mean of 20-step windows)",
        "",
        "| step | live_loss |",
        "|---|---|",
    ]
    md += [f"| {s} | {v:.4f} |" for s, v in losses]
    md += [
        "",
        f"Loss {first[1]:.3f} @ step {first[0]} -> {last[1]:.3f} @ step"
        f" {last[0]} ({drop:.1f}x drop): the driver stepped, preempted,"
        " resumed and kept optimizing on-chip.",
    ]
    os.makedirs(osp.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {args.out}: loss {first[1]:.3f} -> {last[1]:.3f} over "
          f"{len(losses)} flushes")


if __name__ == "__main__":
    main()
