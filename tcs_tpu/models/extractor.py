"""Feature / context encoders (reference ``core/extractor.py``).

``MultiBasicEncoder`` (reference :195) produces a 3-scale ladder of
(net, inp) context pairs at 1/4, 1/8, 1/16 resolution (with n_downsample=2)
and, in ``dual_inp`` / shared-backbone mode, also returns the 1/4 trunk
features of the stacked (image1, image2) batch for the matching head.

``BasicEncoder`` (reference :119) is the separate matching-feature network
used only when the backbone is not shared.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from tcs_tpu.models.layers import (
    Conv,
    Norm,
    ResidualBlock,
    kaiming_normal_fan_out,
)


class _Stage(nn.Module):
    """Two stacked ResidualBlocks (reference ``_make_layer``)."""

    dim: int
    norm_fn: str
    stride: int
    dtype: Any = jnp.float32
    dual: int = 1
    save_tag: Any = None  # forwarded to ResidualBlock.save_tag

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(self.dim, self.norm_fn, self.stride,
                          dtype=self.dtype, dual=self.dual,
                          save_tag=self.save_tag, name="res1")(x)
        x = ResidualBlock(self.dim, self.norm_fn, 1, dtype=self.dtype,
                          dual=self.dual, save_tag=self.save_tag,
                          name="res2")(x)
        return x


class _OutHead(nn.Module):
    """ResidualBlock + 3×3 conv output head (reference :225-237)."""

    dim: int
    norm_fn: str
    with_res: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_res:
            x = ResidualBlock(128, self.norm_fn, 1, dtype=self.dtype,
                              name="res")(x)
        return Conv(self.dim, 3, 1, 1, kernel_init=kaiming_normal_fan_out,
                    dtype=self.dtype, name="conv")(x)


class MultiBasicEncoder(nn.Module):
    """Context encoder ladder.

    Returns ``(cnet_list, trunk)`` where cnet_list is a tuple over scales
    (fine→coarse) of tuples over output sets — with
    ``output_dims=[hidden_dims, context_dims]`` each scale yields
    ``(net, inp)``. ``trunk`` is the pre-head 1/4 features (dual_inp mode) or
    None.
    """

    output_dims: Sequence[Sequence[int]] = ((128, 128, 128), (128, 128, 128))
    norm_fn: str = "none"
    dtype: Any = jnp.float32
    # Run the dual-image trunk with the two images packed along channels
    # (exact numerics, measured ~1.6× faster on TPU for the 64-channel
    # full-resolution stages — see layers.Conv ``dual``). Only valid with
    # per-channel norms ('none'/'instance').
    packed_dual: bool = False
    # Space-to-depth factor for conv1 (batch-stacked trunk only — it doesn't
    # compose with channel packing): the 7×7 conv on a 3/6-channel input is
    # the single worst op of the training step at 6/128 MXU lanes (see
    # layers.Conv.s2d).
    conv1_s2d: int = 1

    @nn.compact
    def __call__(self, x, dual_inp: bool = False, num_layers: int = 3):
        packed = self.packed_dual and dual_inp
        dual = 2 if packed else 1
        if packed:
            B2 = x.shape[0]
            # (2B, H, W, 3) → (B, H, W, 6): image1 in channels [:3].
            x = jnp.concatenate([x[: B2 // 2], x[B2 // 2:]], axis=-1)
        x = Conv(64, 7, 1, 3, kernel_init=kaiming_normal_fan_out,
                 dtype=self.dtype, dual=dual,
                 s2d=1 if packed else self.conv1_s2d, name="conv1")(x)
        x = Norm(self.norm_fn, 64, dtype=self.dtype, name="norm1")(x)
        x = nn.relu(x)
        # Named remat checkpoints: under frame-level remat with a
        # save_only_these_names policy (TrainConfig.remat_save_names) these
        # full-resolution stage outputs are SAVED instead of recomputed in the
        # backward. conv1 especially: a 7×7 conv on 6 input channels runs at
        # ~2% MXU utilisation (6 of 128 lanes), ~20 ms/step forward at recipe
        # shapes, and the plain remat backward recomputes it twice. Its own
        # weight gradient only needs the *images* (scan inputs), so saving the
        # output removes the recompute entirely. No-ops without the policy.
        x = checkpoint_name(x, "enc_conv1")

        # 'enc_inner' tags the full-resolution stage's intra-block
        # activations: its four 64-channel convs at H×W are the most
        # expensive recompute of the frame-remat backward (PERF.md per-op
        # trace); saving ~6 bf16 (2B,H,W,64) tensors per frame removes them
        # from the replay entirely. Active only when the remat policy names
        # the tag.
        x = _Stage(64, self.norm_fn, 1, dtype=self.dtype, dual=dual,
                   save_tag="enc_inner", name="layer1")(x)
        x = checkpoint_name(x, "enc_layer1")
        x = _Stage(96, self.norm_fn, 2, dtype=self.dtype, dual=dual,
                   name="layer2")(x)
        x = checkpoint_name(x, "enc_layer2")
        x = _Stage(128, self.norm_fn, 2, dtype=self.dtype, dual=dual,
                   name="layer3")(x)
        x = checkpoint_name(x, "enc_layer3")

        trunk = None
        if dual_inp:
            if packed:
                # (B, h, w, 256) → (2B, h, w, 128); heads see image1 only.
                trunk = jnp.concatenate([x[..., :128], x[..., 128:]], axis=0)
                x = x[..., :128]
            else:
                trunk = x
                x = x[: x.shape[0] // 2]

        outs = []
        scale04 = tuple(
            _OutHead(dims[2], self.norm_fn, dtype=self.dtype,
                     name=f"outputs04_{i}")(x)
            for i, dims in enumerate(self.output_dims)
        )
        outs.append(scale04)
        if num_layers >= 2:
            y = _Stage(128, self.norm_fn, 2, dtype=self.dtype, name="layer4")(x)
            scale08 = tuple(
                _OutHead(dims[1], self.norm_fn, dtype=self.dtype,
                         name=f"outputs08_{i}")(y)
                for i, dims in enumerate(self.output_dims)
            )
            outs.append(scale08)
        if num_layers >= 3:
            z = _Stage(128, self.norm_fn, 2, dtype=self.dtype, name="layer5")(y)
            scale16 = tuple(
                _OutHead(dims[0], self.norm_fn, with_res=False,
                         dtype=self.dtype, name=f"outputs16_{i}")(z)
                for i, dims in enumerate(self.output_dims)
            )
            outs.append(scale16)
        return tuple(outs), trunk


class BasicEncoder(nn.Module):
    """Matching-feature encoder (non-shared-backbone path, reference :119)."""

    output_dim: int = 256
    norm_fn: str = "instance"
    downsample: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        stride1 = 1 + (self.downsample > 2)
        x = Conv(64, 7, stride1, 3, kernel_init=kaiming_normal_fan_out,
                 dtype=self.dtype, name="conv1")(x)
        x = Norm(self.norm_fn, 64, dtype=self.dtype, name="norm1")(x)
        x = nn.relu(x)
        x = _Stage(64, self.norm_fn, 1, dtype=self.dtype, name="layer1")(x)
        x = _Stage(96, self.norm_fn, 1 + (self.downsample > 1),
                   dtype=self.dtype, name="layer2")(x)
        x = _Stage(128, self.norm_fn, 1 + (self.downsample > 0),
                   dtype=self.dtype, name="layer3")(x)
        return Conv(self.output_dim, 1, 1, 0,
                    kernel_init=kaiming_normal_fan_out, dtype=self.dtype,
                    name="conv2")(x)


class SharedBackboneHead(nn.Module):
    """Matching head on the shared trunk (reference ``tc_stereo.py:40-43``)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResidualBlock(128, "instance", 1, dtype=self.dtype, name="res")(x)
        return Conv(256, 3, 1, 1, dtype=self.dtype, name="conv")(x)
