#!/usr/bin/env python
"""End-to-end sanity run: train TCStereo on a synthetic constant-disparity
scene for a few steps and verify the loss decreases. Runs on CPU or one TPU
chip. Used by the project verify skill.

  python scripts/demo_train_synthetic.py [--steps 6] [--cpu]
"""

import argparse
import logging
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tcs_tpu.config import ModelConfig, TrainConfig
    from tcs_tpu.data.loader import SequenceLoader
    from tcs_tpu.data.synthetic import SyntheticStereoSequence
    from tcs_tpu.train.trainer import Trainer

    import tempfile

    H, W = 64, 96
    cfg = TrainConfig(
        name="demo_synth",
        model=ModelConfig(mixed_precision=not args.cpu),
        train_iters=2,
        batch_size=1,
        image_size=(H, W),
        frame_length=2,
        num_steps=args.steps,
        lr=2e-4,
        checkpoint_dir=tempfile.mkdtemp(prefix="tcs_demo_ckpt_"),
        remat_frames=False,
    )
    # A single repeated scene → the loss must decrease step over step.
    ds = SyntheticStereoSequence(n_samples=1, frame_length=2, height=H,
                                 width=W)
    trainer = Trainer(cfg)
    t0 = time.time()
    losses = []

    # intercept metrics through the logger
    push = trainer.logger.push

    def capture(metrics):
        losses.append(float(metrics["live_loss"]))
        push(metrics)

    trainer.logger.push = capture
    trainer.train(dataset=ds)
    print(f"losses: {[round(l, 3) for l in losses]}")
    print(f"total {time.time() - t0:.1f}s")
    # Early steps at peak LR are noisy (the bootstrap mask is discontinuous in
    # the params); compare the first vs last thirds of the trajectory.
    k = max(len(losses) // 3, 1)
    head = sum(losses[:k]) / k
    tail = sum(losses[-k:]) / k
    assert tail < head, f"loss did not decrease: head={head:.2f} tail={tail:.2f}"
    print(f"DEMO OK: loss decreased {head:.2f} -> {tail:.2f}")


if __name__ == "__main__":
    main()
