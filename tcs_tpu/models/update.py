"""GRU update stack, temporal completion and dual-space refinement heads.

Equivalents of the reference ``core/update.py``:

- :class:`ConvGRU`, :class:`BasicMotionEncoder`, :class:`FlowHead`,
  :class:`BasicMultiUpdateBlock` — the 3-level ConvGRU cascade (:127).
  NOTE on naming: the reference calls its GRUs gru08/16/32 but with
  n_downsample=2 they operate at 1/4, 1/8 and 1/16 resolution; here they are
  named by cascade position (gru_fine / gru_mid / gru_coarse).
- :class:`LightFuse` (:20) — gated fusion of current vs pose-warped hidden
  state; :class:`HiddenstateUpdater` (:48) — hidden update from Δdisp.
- :class:`DisparityCompletor` (:308) — temporal disparity completion (TDC).
- :class:`DispGradPredictor` (:171) — gradient-space refinement.
- :class:`DispRefine` (:217) — gradient-guided propagation over 9 planar
  candidates + convex-upsample mask head.

All modules are NHWC with compute dtype ``dtype`` (bf16 under the mixed
precision policy) and fp32 parameters.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcs_tpu.geometry import disp2disp_grad_candidates
from tcs_tpu.models.layers import (
    BasicConvIN,
    Conv,
    Conv2xIN,
    ConvSeq,
    instance_norm,
    kaiming_normal_fan_in,
    leaky_relu,
)
from tcs_tpu.ops.sampler import pool2x, resize_bilinear


class ConvINConv(nn.Module):
    """conv(stride) → InstanceNorm → ReLU → conv  (completor encoder blocks,
    reference update.py:325-344,356-367)."""

    mid: int
    out: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.mid, 3, self.stride, 1, dtype=self.dtype, name="conv0")(x)
        x = instance_norm(x)
        x = nn.relu(x)
        return Conv(self.out, 3, 1, 1, dtype=self.dtype, name="conv1")(x)


class FlowHead(nn.Module):
    """conv3x3 → relu → conv3x3 (reference :9). Output fp32."""

    hidden_dim: int = 256
    output_dim: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.hidden_dim, 3, 1, 1, kernel_init=kaiming_normal_fan_in,
                 dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = Conv(self.output_dim, 3, 1, 1, kernel_init=kaiming_normal_fan_in,
                 dtype=self.dtype, name="conv2")(x)
        return x.astype(jnp.float32)


class LightFuse(nn.Module):
    """GRU-style gated fusion h ← z·h + (1−z)·q (reference :20)."""

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        zr = Conv(self.hidden_dim * 2, 1, 1, 0, dtype=self.dtype,
                  name="convzr")(hx)
        z, r = jnp.split(zr, 2, axis=-1)
        z = nn.sigmoid(z)
        r = nn.sigmoid(r)
        q = nn.tanh(Conv(self.hidden_dim, 1, 1, 0, dtype=self.dtype,
                         name="convq")(jnp.concatenate([r * h, x], axis=-1)))
        return z * h + (1 - z) * q


class HiddenstateUpdater(nn.Module):
    """Update finest hidden state from Δdisp (reference :48)."""

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, delta_disp):
        x = Conv(64, 1, 1, 0, dtype=self.dtype, name="convs0")(delta_disp)
        x = leaky_relu(x)
        x = Conv(64, 1, 1, 0, dtype=self.dtype, name="convs1")(x)
        hx = jnp.concatenate([h, x], axis=-1)
        zr = Conv(self.hidden_dim * 2, 1, 1, 0, dtype=self.dtype,
                  name="convzr")(hx)
        z, r = jnp.split(zr, 2, axis=-1)
        z = nn.sigmoid(z)
        r = nn.sigmoid(r)
        q = nn.tanh(Conv(self.hidden_dim, 1, 1, 0, dtype=self.dtype,
                         name="convq")(jnp.concatenate([r * h, x], axis=-1)))
        return z * h + (1 - z) * q


class ConvGRU(nn.Module):
    """ConvGRU with externally injected context gates cz/cr/cq (reference :71).

    h ← (1−z)·h + z·q  with  z = σ(conv_z(h,x) + cz), etc.
    """

    hidden_dim: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, cz, cr, cq, *x_list):
        x = jnp.concatenate(x_list, axis=-1)
        hx = jnp.concatenate([h, x], axis=-1)
        zr = Conv(self.hidden_dim * 2, self.kernel, 1, self.kernel // 2,
                  kernel_init=kaiming_normal_fan_in, dtype=self.dtype,
                  name="convzr")(hx)
        z, r = jnp.split(zr, 2, axis=-1)
        z = nn.sigmoid(z + cz)
        r = nn.sigmoid(r + cr)
        q = nn.tanh(
            Conv(self.hidden_dim, self.kernel, 1, self.kernel // 2,
                 kernel_init=kaiming_normal_fan_in, dtype=self.dtype,
                 name="convq")(jnp.concatenate([r * h, x], axis=-1))
            + cq
        )
        return (1 - z) * h + z * q


class BasicMotionEncoder(nn.Module):
    """Encode (flow, corr-lookup) into motion features (reference :90)."""

    dtype: Any = jnp.float32
    # Space-to-depth factor for the 7×7 conv on the 1-channel flow (convf1):
    # 1 of 128 MXU lanes otherwise; at 1/4-resolution the s2d/d2s reshapes
    # are on tiny tensors, so the block-conv form (layers.Conv.s2d) wins.
    flow_stem_s2d: int = 1
    # Zero-pad the corr-lookup's 36-channel input (and convc1's kernel rows)
    # up to a multiple of this at apply time (layers.Conv.in_pad — exact
    # numerics, params unchanged, keeps the conv's backward on the MXU).
    corr_pad: int = 1

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(64, 1, 1, 0, kernel_init=kaiming_normal_fan_in,
                           dtype=self.dtype, in_pad=self.corr_pad,
                           name="convc1")(corr))
        cor = nn.relu(Conv(64, 3, 1, 1, kernel_init=kaiming_normal_fan_in,
                           dtype=self.dtype, name="convc2")(cor))
        flo = nn.relu(Conv(64, 7, 1, 3, kernel_init=kaiming_normal_fan_in,
                           dtype=self.dtype, s2d=self.flow_stem_s2d,
                           name="convf1")(flow))
        flo = nn.relu(Conv(64, 3, 1, 1, kernel_init=kaiming_normal_fan_in,
                           dtype=self.dtype, name="convf2")(flo))
        out = nn.relu(
            Conv(127, 3, 1, 1, kernel_init=kaiming_normal_fan_in,
                 dtype=self.dtype, name="conv")(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class BasicMultiUpdateBlock(nn.Module):
    """3-level ConvGRU cascade with cross-scale pooling/upsampling
    (reference :127). net order: index 0 = finest (1/4)."""

    hidden_dims: Sequence[int] = (128, 128, 128)
    n_gru_layers: int = 3
    dtype: Any = jnp.float32
    flow_stem_s2d: int = 1
    corr_pad: int = 1

    def setup(self):
        self.encoder = BasicMotionEncoder(dtype=self.dtype,
                                          flow_stem_s2d=self.flow_stem_s2d,
                                          corr_pad=self.corr_pad)
        # hidden_dims indexing mirrors the reference: [coarse, mid, fine].
        self.gru_fine = ConvGRU(self.hidden_dims[2], dtype=self.dtype)
        self.gru_mid = ConvGRU(self.hidden_dims[1], dtype=self.dtype)
        self.gru_coarse = ConvGRU(self.hidden_dims[0], dtype=self.dtype)
        self.flow_head = FlowHead(hidden_dim=256, output_dim=1,
                                  dtype=self.dtype)

    def __call__(self, net, inp, corr=None, flow=None, iter_fine=True,
                 iter_mid=True, iter_coarse=True, update=True):
        net = list(net)
        if iter_coarse and self.n_gru_layers == 3:
            net[2] = self.gru_coarse(net[2], *(inp[2]), pool2x(net[1]))
        if iter_mid and self.n_gru_layers >= 2:
            if self.n_gru_layers > 2:
                net[1] = self.gru_mid(
                    net[1], *(inp[1]), pool2x(net[0]),
                    resize_bilinear(net[2], net[1].shape[1:3]),
                )
            else:
                net[1] = self.gru_mid(net[1], *(inp[1]), pool2x(net[0]))
        if iter_fine:
            motion = self.encoder(flow.astype(self.dtype), corr.astype(self.dtype))
            if self.n_gru_layers > 1:
                net[0] = self.gru_fine(
                    net[0], *(inp[0]), motion,
                    resize_bilinear(net[1], net[0].shape[1:3]),
                )
            else:
                net[0] = self.gru_fine(net[0], *(inp[0]), motion)
        if not update:
            return tuple(net)
        delta_flow = self.flow_head(net[0])
        return tuple(net), delta_flow


class DispGradPredictor(nn.Module):
    """Gradient-space refinement (reference :171).

    Refines the raw forward-difference disparity gradient using 16
    plane-gradient candidates and a 3-scale encoder-decoder fused with
    gradient-context features.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp_grad, disp, clist):
        disp_grad = 5.0 * jax.lax.stop_gradient(disp_grad)
        disp = jax.lax.stop_gradient(disp)
        B, H, W, _ = disp.shape
        cands = disp2disp_grad_candidates(disp, level=2)  # (B,H,W,16,2) fp32
        # Reference channel order: (component, direction) — reshape of
        # (N, 2, 16, H, W) → 32 channels with component slowest.
        cands = cands.transpose(0, 1, 2, 4, 3).reshape(B, H, W, 32)

        x4_grad = ConvSeq(((32, 3, 1, 1), (32, 3, 1, 1)), dtype=self.dtype,
                          name="conv_grad_stem")(disp_grad.astype(self.dtype))
        x4_cand = ConvSeq(((64, 3, 1, 1), (64, 3, 1, 1)), dtype=self.dtype,
                          name="conv_grad_candidate_stem")(cands.astype(self.dtype))
        x4 = ConvSeq(((64, 3, 1, 1),), final_relu=True, dtype=self.dtype,
                     name="conv_4_4")(
            jnp.concatenate([x4_grad, x4_cand, clist[0]], axis=-1)
        )
        x8 = ConvSeq(((96, 3, 2, 1),), final_relu=True, dtype=self.dtype,
                     name="conv_4_8")(x4)
        x8 = ConvSeq(((96, 3, 1, 1),), final_relu=True, dtype=self.dtype,
                     name="conv_8_8")(jnp.concatenate([x8, clist[1]], axis=-1))
        x16 = ConvSeq(((128, 3, 2, 1),), final_relu=True, dtype=self.dtype,
                      name="conv_8_16")(x8)
        x16 = ConvSeq(((128, 3, 1, 1),), final_relu=True, dtype=self.dtype,
                      name="conv_16_16")(
            jnp.concatenate([x16, clist[2]], axis=-1)
        )
        x8_up = Conv2xIN(96, use_in=False, dtype=self.dtype,
                         name="conv_16_8")(x16, x8)
        x4_up = Conv2xIN(64, use_in=False, dtype=self.dtype,
                         name="conv_8_4")(x8_up, x4)
        residual = ConvSeq(((128, 3, 1, 1), (2, 3, 1, 1)), dtype=self.dtype,
                           name="residual_head")(x4_up)
        grad_refine = (disp_grad + residual.astype(jnp.float32)) / 5.0
        context = ConvSeq(((64, 3, 1, 1),), final_relu=True, dtype=self.dtype,
                          name="conv_out")(x4_up)
        return grad_refine, context


class DispRefine(nn.Module):
    """Gradient-guided propagation over 9 planar candidates (reference :217)."""

    downsample_factor: int = 4
    dtype: Any = jnp.float32

    @staticmethod
    def propagate_disparity(disp_grad, disp):
        """Planar extrapolation from the 3×3 neighbourhood.

        disp_grad: (B,H,W,2) fp32, disp: (B,H,W,1) fp32.
        Returns (candidates (B,H,W,9), grad_diff_abs (B,H,W,18)).
        Candidate k (tap (v,u), k = 3v+u) extrapolates the neighbour's plane
        to the centre pixel: d_n + gx_n·(1−u) + gy_n·(1−v)
        (reference :259-289; the coords-difference there reduces to the
        constants (1−u, 1−v)).
        """
        B, H, W, _ = disp.shape
        gpad = jnp.pad(disp_grad, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dpad = jnp.pad(disp, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        g_c = disp_grad  # centre gradients
        cands, gdiffx, gdiffy = [], [], []
        for v in range(3):
            for u in range(3):
                d_n = dpad[:, v : v + H, u : u + W, 0]
                gx_n = gpad[:, v : v + H, u : u + W, 0]
                gy_n = gpad[:, v : v + H, u : u + W, 1]
                cands.append(d_n + gx_n * (1.0 - u) + gy_n * (1.0 - v))
                gdiffx.append(jnp.abs(g_c[..., 0] - gx_n))
                gdiffy.append(jnp.abs(g_c[..., 1] - gy_n))
        candidates = jnp.stack(cands, axis=-1)
        # Reference channel order: all gx diffs then all gy diffs (:287).
        matrix = jnp.stack(gdiffx + gdiffy, axis=-1)
        return candidates, jax.lax.stop_gradient(matrix)

    @nn.compact
    def __call__(self, disp_grads, disp, context_disp, context_grad):
        disp = jax.lax.stop_gradient(disp)
        context = ConvSeq(((96, 3, 1, 1), (96, 3, 1, 1)), dtype=self.dtype,
                          name="context_compress")(
            jnp.concatenate([context_disp, context_grad], axis=-1)
        )
        candidates, matrix = self.propagate_disparity(
            disp_grads.astype(jnp.float32), disp.astype(jnp.float32)
        )
        disp_f = ConvSeq(((96, 1, 1, 0), (96, 1, 1, 0)), dtype=self.dtype,
                         name="disp_f_stem")(
            jnp.concatenate(
                [jax.lax.stop_gradient(candidates), matrix], axis=-1
            ).astype(self.dtype)
        )
        fused = ConvSeq(((128, 3, 1, 1), (128, 3, 1, 1)), final_relu=True,
                        dtype=self.dtype, name="conv_fuse")(
            jnp.concatenate([disp_f, context], axis=-1)
        )
        w = ConvSeq(((128, 3, 1, 1), (9, 1, 1, 0)), dtype=self.dtype,
                    name="w_head")(fused)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
        refined = jnp.sum(w * candidates, axis=-1, keepdims=True)
        return refined, fused


class UpsampleMaskHead(nn.Module):
    """Convex-upsample mask logits ×0.25 from the refiner's fused features
    (reference ``DispRefine.mask``, :254-257,:304). Split into its own module
    so test-mode inference can run it once, on the final iteration only."""

    downsample_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fused):
        f2 = self.downsample_factor ** 2
        m = ConvSeq(((256, 3, 1, 1), (f2 * 9, 1, 1, 0)), dtype=self.dtype,
                    name="mask")(fused)
        return 0.25 * m.astype(jnp.float32)


class DisparityCompletor(nn.Module):
    """Temporal disparity completion (TDC, reference :308).

    Embeds (sparse disp/10, cost, mask−0.5), runs a 3-scale encoder-decoder
    fused with context, and outputs:
      completed = (w·sparse + (1−w)·mono)·10, mono disparity ·10, fusion
      weight w, and per-scale candidate hidden states.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, cost, mask, context_list):
        dt = self.dtype
        mask = mask - 0.5
        disp = disp / 10.0

        disp_f = ConvSeq(((64, 1, 1, 0), (64, 1, 1, 0)), dtype=dt,
                         name="conv_disp_stem")(disp.astype(dt))
        cost_f = ConvSeq(((32, 1, 1, 0), (32, 1, 1, 0)), dtype=dt,
                         name="conv_cost_stem")(cost.astype(dt))
        mask_f = ConvSeq(((32, 1, 1, 0), (32, 1, 1, 0)), dtype=dt,
                         name="conv_mask_stem")(mask.astype(dt))
        x4_disp = ConvSeq(((128, 1, 1, 0), (64, 1, 1, 0)), dtype=dt,
                          name="conv_disp_fuse")(
            jnp.concatenate([disp_f, cost_f, mask_f], axis=-1)
        )

        x4 = ConvINConv(192, 64, dtype=dt, name="conv_4_4")(
            jnp.concatenate([x4_disp, context_list[0]], axis=-1)
        )
        x8 = ConvINConv(64, 64, stride=2, dtype=dt, name="conv_4_8")(x4)
        x8 = ConvINConv(192, 64, dtype=dt, name="conv_8_8")(
            jnp.concatenate([x8, context_list[1]], axis=-1)
        )
        x16 = ConvINConv(64, 64, stride=2, dtype=dt, name="conv_8_16")(x8)
        x16_out = ConvINConv(192, 64, dtype=dt, name="conv_16_16")(
            jnp.concatenate([x16, context_list[2]], axis=-1)
        )

        x8_out = Conv2xIN(64, use_in=True, dtype=dt, name="conv_16_8")(
            x16_out, x8
        )
        x4_out = Conv2xIN(64, use_in=True, dtype=dt, name="conv_8_4")(
            x8_out, x4
        )
        disp_mono = ConvSeq(((128, 3, 1, 1), (1, 3, 1, 1)), dtype=dt,
                            name="disp_head")(x4_out).astype(jnp.float32)
        w = ConvSeq(((128, 3, 1, 1), (1, 3, 1, 1)), dtype=dt,
                    name="w_head")(x4_out)
        w = nn.sigmoid(w.astype(jnp.float32))

        disp_completed = (w * disp.astype(jnp.float32) + (1 - w) * disp_mono) * 10.0
        disp_mono = disp_mono * 10.0

        net4 = ConvINConv(192, 128, dtype=dt, name="conv_out4_disp")(
            jnp.concatenate([x4_out, context_list[0]], axis=-1)
        )
        net8 = ConvINConv(192, 128, dtype=dt, name="conv_out8_disp")(
            jnp.concatenate([x8_out, context_list[1]], axis=-1)
        )
        net16 = ConvINConv(192, 128, dtype=dt, name="conv_out16_disp")(
            jnp.concatenate([x16_out, context_list[2]], axis=-1)
        )
        return disp_completed, disp_mono, w, (net4, net8, net16)
