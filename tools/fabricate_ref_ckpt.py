#!/usr/bin/env python
"""Fabricate a reference-format ``.pth`` checkpoint at random init.

Builds the torch reference TCStereo (read-only import from /root/reference,
cupy stubbed — construction never calls the CUDA splat) with the launch
scripts' architecture flags and saves ``{'model': state_dict, 'total_steps':
0}`` in the exact format of the released checkpoints
(``/root/reference/train_stereo.py:260-269``). Lets the whole
download→convert→score chain (``tools/score_released_ckpt.sh``) be exercised
end-to-end in environments without egress: everything but the download runs
against this fabricated file.

Usage:
  python tools/fabricate_ref_ckpt.py --out /tmp/fabricated.pth [--seed 7]
"""

from __future__ import annotations

import argparse
import sys
import types

REFERENCE = "/root/reference"


def build_reference_model(seed: int = 7):
    import torch

    cupy = types.ModuleType("cupy")

    def memoize(**kw):
        def deco(f):
            return f

        return deco

    cupy.memoize = memoize
    sys.modules.setdefault("cupy", cupy)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)

    from core.tc_stereo import TCStereo as TorchTCStereo

    args = argparse.Namespace(
        hidden_dims=[128, 128, 128], corr_levels=4, corr_radius=4,
        n_downsample=2, n_gru_layers=3, context_norm="none",
        shared_backbone=True, slow_fast_gru=False, mixed_precision=False,
        init_thres=0.5,
    )
    torch.manual_seed(seed)
    return TorchTCStereo(args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import torch

    model = build_reference_model(args.seed)
    sd = model.state_dict()
    torch.save({"model": sd, "total_steps": 0}, args.out)
    n = sum(v.numel() for v in sd.values())
    print(f"fabricated reference checkpoint ({n} params) -> {args.out}")


if __name__ == "__main__":
    main()
