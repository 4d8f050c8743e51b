"""Training metrics logging (reference ``Logger``, ``train_stereo.py:195-246``).

Running-mean accumulation with periodic flush; backends are pluggable —
stdout/python-logging always, wandb only when available *and* explicitly
requested (the reference hardcodes a wandb entity and makes wandb a hard
dependency; here it is optional). Metrics arrive as jnp scalars and are only
fetched to host at flush time (one device sync per ``sum_freq`` steps instead
of the reference's per-frame ``.item()`` syncs).
"""

from __future__ import annotations

import json
import logging
import time
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger("tcs_tpu")


class MetricsLogger:
    def __init__(self, sum_freq: int = 100, frame_length: int = 1,
                 use_wandb: bool = False, wandb_init_kwargs: Optional[dict] = None,
                 jsonl_path: Optional[str] = None):
        self.sum_freq = sum_freq * frame_length
        self.frame_length = frame_length
        self.total_steps = 0
        self.running: Dict[str, float] = {}
        self._pending = []  # device scalars, fetched lazily at flush
        self.jsonl_path = jsonl_path
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(**(wandb_init_kwargs or {}))
                self._wandb = wandb
            except Exception as e:  # wandb unavailable/offline
                logger.warning("wandb disabled: %s", e)

    def push(self, metrics: Dict):
        """Accumulate one step's metrics (device or host scalars)."""
        self.total_steps += 1
        self._pending.append(metrics)
        if self.total_steps % self.sum_freq == self.sum_freq - 1:
            self._flush()

    def _flush(self):
        if not self._pending:
            return
        # Fetch device values now (single sync point).
        acc: Dict[str, float] = {}
        for m in self._pending:
            for k, v in m.items():
                acc[k] = acc.get(k, 0.0) + float(v)
        n = len(self._pending)
        self._pending = []
        means = {k: v / n for k, v in acc.items()}
        step = self.total_steps // self.frame_length
        rate = self.sum_freq / max(time.time() - self._t0, 1e-9)
        self._t0 = time.time()
        msg = ", ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
        logger.info("step %d (%.2f it/s): %s", step, rate, msg)
        if self._wandb is not None:
            self._wandb.log(means, step=step)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"step": step, **means}) + "\n")

    def log_images(self, tag: str, image, disp_pred, disp_gt=None,
                   out_dir: Optional[str] = None, vmax: float = 96.0):
        """Log a qualitative disparity panel (wandb image and/or PNG on disk)."""
        from tcs_tpu.utils.visualization import disparity_panel

        panel = disparity_panel(image, disp_pred, disp_gt, vmax)
        if self._wandb is not None:
            self._wandb.log({tag: self._wandb.Image(panel)})
        if out_dir:
            import os

            from PIL import Image as PILImage

            os.makedirs(out_dir, exist_ok=True)
            PILImage.fromarray(panel).save(
                os.path.join(out_dir, f"{tag.replace('/', '_')}_{self.total_steps}.png")
            )

    def write_dict(self, results: Dict):
        """Log evaluation results immediately."""
        logger.info("eval: %s", results)
        if self._wandb is not None:
            self._wandb.log(results)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"step": self.total_steps, **results}) + "\n")
