#!/usr/bin/env python
"""Convert a reference TC-Stereo torch checkpoint into tcs_tpu Flax params.

The reference releases ``.pth`` checkpoints (``README.md:82``,
``train_stereo.py:260-269`` format: dict with 'model' state_dict). This tool
maps every tensor into the tcs_tpu parameter tree so released weights can be
evaluated on TPU and used for A/B numerics validation (SURVEY.md §7 "parity
validation").

Layout transforms:
- Conv2d weight (O, I, kh, kw) → flax (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw) → flax transpose_kernel (kh, kw, O, I)
  (both are axes (2, 3, 1, 0))

Usage:
  python tools/convert_torch_ckpt.py --pth sceneflow.pth --out checkpoints/sceneflow
"""

from __future__ import annotations

import argparse
import sys
from typing import Dict

import numpy as np

sys.path.insert(0, ".")


def _w(t):  # conv/deconv weight
    return np.asarray(t).transpose(2, 3, 1, 0)


def _b(t):
    return np.asarray(t)


def _conv(sd, prefix):
    """torch Conv2d → {Conv_0: {kernel, bias?}}."""
    out = {"kernel": _w(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = _b(sd[prefix + ".bias"])
    return {"Conv_0": out}


def _deconv(sd, prefix):
    out = {"kernel": _w(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        out["bias"] = _b(sd[prefix + ".bias"])
    return {"ConvTranspose_0": out}


def _residual_block(sd, prefix):
    """ResidualBlock (norm_fn none/instance → no norm params)."""
    out = {
        "conv1": _conv(sd, prefix + ".conv1"),
        "conv2": _conv(sd, prefix + ".conv2"),
    }
    if prefix + ".downsample.0.weight" in sd:
        out["downsample"] = _conv(sd, prefix + ".downsample.0")
    return out


def _stage(sd, prefix):
    return {
        "res1": _residual_block(sd, prefix + ".0"),
        "res2": _residual_block(sd, prefix + ".1"),
    }


def _convseq(sd, prefix, torch_indices):
    """torch Sequential conv indices → ConvSeq {conv0, conv1, ...}."""
    return {
        f"conv{i}": _conv(sd, f"{prefix}.{ti}")
        for i, ti in enumerate(torch_indices)
    }


def _conv_in_conv(sd, prefix):
    """Sequential(Conv, IN, ReLU, Conv) → ConvINConv {conv0, conv1}."""
    return {
        "conv0": _conv(sd, prefix + ".0"),
        "conv1": _conv(sd, prefix + ".3"),
    }


def _conv2x(sd, prefix):
    """Conv2x_IN: conv1 = BasicConv_IN(deconv), conv2 = BasicConv_IN(conv)."""
    return {
        "conv1": {"conv": _deconv(sd, prefix + ".conv1.conv")},
        "conv2": {"conv": _conv(sd, prefix + ".conv2.conv")},
    }


def _gru(sd, prefix):
    return {
        "convzr": _conv(sd, prefix + ".convzr"),
        "convq": _conv(sd, prefix + ".convq"),
    }


def convert_state_dict(sd: Dict[str, np.ndarray], n_gru_layers: int = 3) -> Dict:
    """Reference TCStereo state_dict → tcs_tpu params['params'] tree."""
    p: Dict = {}

    # --- cnet ---
    cnet = {"conv1": _conv(sd, "cnet.conv1")}
    for i in range(1, 6):
        cnet[f"layer{i}"] = _stage(sd, f"cnet.layer{i}")
    # reference names by nominal /8,/16,/32 — actual scales are /4,/8,/16.
    for i in range(2):
        cnet[f"outputs04_{i}"] = {
            "res": _residual_block(sd, f"cnet.outputs08.{i}.0"),
            "conv": _conv(sd, f"cnet.outputs08.{i}.1"),
        }
        cnet[f"outputs08_{i}"] = {
            "res": _residual_block(sd, f"cnet.outputs16.{i}.0"),
            "conv": _conv(sd, f"cnet.outputs16.{i}.1"),
        }
        cnet[f"outputs16_{i}"] = {"conv": _conv(sd, f"cnet.outputs32.{i}")}
    p["cnet"] = cnet

    # --- shared-backbone matching head ---
    if "conv2.0.conv1.weight" in sd:
        p["conv2"] = {
            "res": _residual_block(sd, "conv2.0"),
            "conv": _conv(sd, "conv2.1"),
        }

    # --- non-shared matching encoder (reference extractor.py:119, built
    # when shared_backbone is off: tc_stereo.py:45) ---
    if "fnet.conv1.weight" in sd:
        p["fnet"] = {
            "conv1": _conv(sd, "fnet.conv1"),
            "layer1": _stage(sd, "fnet.layer1"),
            "layer2": _stage(sd, "fnet.layer2"),
            "layer3": _stage(sd, "fnet.layer3"),
            "conv2": _conv(sd, "fnet.conv2"),
        }

    # --- context projections + fusers ---
    for i in range(n_gru_layers):
        p[f"context_zqr_convs_{i}"] = _conv(sd, f"context_zqr_convs.{i}")
        p[f"context_zqr_convs_grad_{i}"] = _conv(sd, f"context_zqr_convs_grad.{i}")
        p[f"hidden_fuse_{i}"] = _gru(sd, f"previous_current_hideen_fuse.{i}")

    # --- disparity completor ---
    dc = {}
    for stem in ("conv_disp_stem", "conv_cost_stem", "conv_mask_stem",
                 "conv_disp_fuse"):
        dc[stem] = _convseq(sd, f"disp_completor.{stem}", (0, 2))
    for blk in ("conv_4_4", "conv_4_8", "conv_8_8", "conv_8_16", "conv_16_16",
                "conv_out4_disp", "conv_out8_disp", "conv_out16_disp"):
        dc[blk] = _conv_in_conv(sd, f"disp_completor.{blk}")
    dc["conv_16_8"] = _conv2x(sd, "disp_completor.conv_16_8")
    dc["conv_8_4"] = _conv2x(sd, "disp_completor.conv_8_4")
    dc["disp_head"] = _convseq(sd, "disp_completor.disp_head", (0, 2))
    dc["w_head"] = _convseq(sd, "disp_completor.w_head", (0, 2))
    p["disp_completor"] = dc

    # --- per-iteration cell ---
    cell = {}
    ub = {
        "encoder": {
            name: _conv(sd, f"update_block.encoder.{name}")
            for name in ("convc1", "convc2", "convf1", "convf2", "conv")
        },
        "gru_fine": _gru(sd, "update_block.gru08"),
        "gru_mid": _gru(sd, "update_block.gru16"),
        "gru_coarse": _gru(sd, "update_block.gru32"),
        "flow_head": {
            "conv1": _conv(sd, "update_block.flow_head.conv1"),
            "conv2": _conv(sd, "update_block.flow_head.conv2"),
        },
    }
    cell["update_block"] = ub

    gr = {
        "conv_grad_stem": _convseq(sd, "disp_grad_refine.conv_grad_stem", (0, 2)),
        "conv_grad_candidate_stem": _convseq(
            sd, "disp_grad_refine.conv_grad_candidate_stem", (0, 2)),
        "conv_4_4": _convseq(sd, "disp_grad_refine.conv_4_4", (0,)),
        "conv_4_8": _convseq(sd, "disp_grad_refine.conv_4_8", (0,)),
        "conv_8_8": _convseq(sd, "disp_grad_refine.conv_8_8", (0,)),
        "conv_8_16": _convseq(sd, "disp_grad_refine.conv_8_16", (0,)),
        "conv_16_16": _convseq(sd, "disp_grad_refine.conv_16_16", (0,)),
        "conv_16_8": _conv2x(sd, "disp_grad_refine.conv_16_8"),
        "conv_8_4": _conv2x(sd, "disp_grad_refine.conv_8_4"),
        "residual_head": _convseq(sd, "disp_grad_refine.residual_head", (0, 2)),
        "conv_out": _convseq(sd, "disp_grad_refine.conv_out", (0,)),
    }
    cell["disp_grad_refine"] = gr

    dr = {
        "context_compress": _convseq(sd, "disp_refine.context_compress", (0, 2)),
        "disp_f_stem": _convseq(sd, "disp_refine.disp_f_stem", (0, 2)),
        "conv_fuse": _convseq(sd, "disp_refine.conv_fuse", (0, 2)),
        "w_head": _convseq(sd, "disp_refine.w_head", (0, 2)),
    }
    cell["disp_refine"] = dr
    # The convex-upsample mask head lives at the top level in tcs_tpu (it is
    # applied outside the iteration scan, batched over iterations).
    p["upsample_mask_head"] = {
        "mask": _convseq(sd, "disp_refine.mask", (0, 2)),
    }
    cell["hiddenstate_update"] = {
        "convs0": _conv(sd, "hiddenstate_update.convs.0"),
        "convs1": _conv(sd, "hiddenstate_update.convs.2"),
        "convzr": _conv(sd, "hiddenstate_update.convzr"),
        "convq": _conv(sd, "hiddenstate_update.convq"),
    }
    p["iter_cell"] = cell
    return {"params": p}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True, help="orbax output directory")
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.pth, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    params = convert_state_dict(sd)

    import jax.numpy as jnp

    params = {"params": _tree_to_jnp(params["params"])}

    from tcs_tpu.utils.checkpoint import save_params

    save_params(args.out, params)
    n = sum(v.size for v in _tree_leaves(params))
    print(f"converted {n} params → {args.out}")


def _tree_to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
