"""TCStereo: temporally consistent stereo model (reference ``core/tc_stereo.py:25``).

TPU-first redesign of the per-frame forward pass as a *pure function* of
``(params, frame inputs, temporal state)``:

- One jitted function serves both the first frame (cost-volume argmax
  bootstrap) and subsequent frames (pose-based forward splat of the previous
  disparity + features): the temporal state is always threaded as a pytree
  with a scalar validity flag, and ``lax.cond`` selects the path — no
  recompiles between frames (the reference branches in Python,
  tc_stereo.py:119-143).
- The 5-step GRU/refinement loop is a lifted ``nn.scan`` over a
  :class:`RefinementCell` with parameters broadcast across iterations,
  with gradient-stopped disparity carries matching the reference's
  ``coords1.detach()`` per iteration (:176).
- Mixed precision follows the reference autocast map: conv stacks in bf16
  (``dtype``), correlation volume / geometry / disparity arithmetic in fp32.

Layouts: NHWC images (B, H, W, 3) in [0, 255]; disparity fields (B, H/f, W/f, 1)
at 1/4 resolution (f = 2**n_downsample).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from tcs_tpu.config import ModelConfig
from tcs_tpu import geometry
from tcs_tpu.models.extractor import BasicEncoder, MultiBasicEncoder, SharedBackboneHead
from tcs_tpu.models.layers import Conv
from tcs_tpu.models.update import (
    BasicMultiUpdateBlock,
    DispGradPredictor,
    DispRefine,
    DisparityCompletor,
    HiddenstateUpdater,
    LightFuse,
    UpsampleMaskHead,
)
from tcs_tpu.ops import corr as corr_ops
from tcs_tpu.ops.sampler import (
    bilinear_sampler,
    convex_upsample,
    coords_grid,
    resize_bilinear,
)


class CameraParams(struct.PyTreeNode):
    """Stereo camera intrinsics/extrinsics for one batch of frames."""

    K: jax.Array  # (B, 3, 3) intrinsics at full image resolution
    baseline: jax.Array  # (B,)


class TemporalState(struct.PyTreeNode):
    """State carried between frames (reference tc_stereo.py:223-243).

    ``valid`` is a scalar bool: False for the first frame of a sequence
    (state contains zeros / identity pose and the bootstrap path is taken).

    Gradient semantics: the carry is detached on BOTH sides. The producer
    stop-gradients disp_q/net_list/fmap1 when building ``new_state``
    (matching the reference's ``.detach()`` carries), and ``TCStereo``
    additionally stop-gradients the ENTIRE incoming state (including T_prev
    and any field added later) so the frame-scan carry cotangent is
    structurally zero and XLA can dead-code-eliminate the temporal-warp
    backward. If a future field must carry cross-frame gradient (full BPTT,
    learned pose), both detach points must be made field-selective.
    """

    disp_q: jax.Array  # (B, H/f, W/f, 1) previous completed disparity, ≥ 0
    net_list: Tuple[jax.Array, ...]  # hidden states, fine→coarse
    fmap1: jax.Array  # (B, H/f, W/f, 256) previous matching features
    T_prev: jax.Array  # (B, 4, 4) previous world→cam pose
    valid: jax.Array  # () bool

    @staticmethod
    def zeros(batch: int, height: int, width: int, cfg: ModelConfig,
              dtype=jnp.float32) -> "TemporalState":
        f = cfg.downsample_factor
        h, w = height // f, width // f
        nets = tuple(
            jnp.zeros((batch, h // (2 ** i), w // (2 ** i), cfg.hidden_dims[i]),
                      dtype)
            for i in range(cfg.n_gru_layers)
        )
        return TemporalState(
            disp_q=jnp.zeros((batch, h, w, 1), dtype),
            net_list=nets,
            fmap1=jnp.zeros((batch, h, w, 256), dtype),
            T_prev=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (batch, 4, 4)),
            valid=jnp.asarray(False),
        )


class TCStereoOutput(struct.PyTreeNode):
    """Forward outputs. Training fields are None in test mode."""

    # Full-resolution flow of the final iteration (clipped ≤ 0).
    flow: Optional[jax.Array]
    # Per-iteration stacked predictions — train mode only.
    flow_predictions: Optional[Tuple[jax.Array, jax.Array]]  # (iters,B,H,W,1) ×2
    flow_q_predictions: Optional[Tuple[jax.Array, jax.Array]]  # (iters,B,h,w,1) ×2
    disp_grad_q_predictions: Optional[jax.Array]  # (iters,B,h,w,2)
    flow_init: Optional[jax.Array]  # (B,H,W,1) upsampled −disp_init
    flow_mono: Optional[jax.Array]  # (B,H,W,1) upsampled −disp_mono
    cost_volume: Optional[jax.Array]  # (B,h,w,W2) masked
    new_state: TemporalState
    # raw_outputs=True only: pre-upsample per-iteration tensors
    # (disp_q_seq, refined_seq, grads_seq, fused_seq, disp_init, disp_mono),
    # for the training step's hoisted mask-head/upsample/loss stage.
    raw: Optional[Tuple[jax.Array, ...]] = None


class RefinementCell(nn.Module):
    """One GRU + dual-space refinement iteration (reference tc_stereo.py:175-218).

    Scanned over ``iters`` with parameters broadcast. The carry holds the
    hidden states and the current disparity; per-iteration outputs are the
    upsampled flow pair, q-scale flow pair and refined gradients.
    """

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        cfg = self.cfg
        dt = self.dtype
        f = cfg.downsample_factor
        net_list, disp = carry
        pyramid, inp_list, grad_list = consts
        B, h, w, _ = disp.shape

        disp = jax.lax.stop_gradient(disp)
        coords_x = coords_grid(B, h, w)[..., 0] - disp[..., 0]
        if cfg.lookup_backend == "pallas":
            from tcs_tpu.ops.pallas.corr_kernel import lookup_pallas

            corr = lookup_pallas(pyramid, coords_x, radius=cfg.corr_radius)
        else:
            lookup_fn = {
                "onehot": corr_ops.lookup_onehot,
                "onehot_w2major": corr_ops.lookup_onehot_w2major,
                "onehot_w2major_vjp": corr_ops.lookup_onehot_w2major_vjp,
                "roll": corr_ops.lookup_roll,
                "window": corr_ops.lookup_window,
                "gather": corr_ops.lookup_gather,
            }[cfg.lookup_backend]
            corr = lookup_fn(pyramid, coords_x, cfg.corr_radius)
        flow_x = -disp

        update_block = BasicMultiUpdateBlock(
            hidden_dims=cfg.hidden_dims, n_gru_layers=cfg.n_gru_layers,
            dtype=dt, flow_stem_s2d=cfg.flow_stem_s2d,
            corr_pad=cfg.corr_pad, name="update_block",
        )
        if cfg.slow_fast_gru and cfg.n_gru_layers == 3:
            net_list = update_block(
                net_list, inp_list, iter_fine=False, iter_mid=False,
                iter_coarse=True, update=False,
            )
        if cfg.slow_fast_gru and cfg.n_gru_layers >= 2:
            net_list = update_block(
                net_list, inp_list, iter_fine=False, iter_mid=True,
                iter_coarse=cfg.n_gru_layers == 3, update=False,
            )
        net_list, delta_flow = update_block(
            net_list, inp_list, corr, flow_x,
            iter_fine=True, iter_mid=cfg.n_gru_layers >= 2,
            iter_coarse=cfg.n_gru_layers == 3,
        )
        disp_q = disp - delta_flow  # coords1 += Δ ⇔ disp −= Δ

        # gradient-space refinement + propagation (fp32 disparity math)
        disp_grad_raw, _ = geometry.disp2disp_gradient_xy(
            jax.lax.stop_gradient(disp_q)
        )
        disp_grad, grad_ctx = DispGradPredictor(dtype=dt, name="disp_grad_refine")(
            disp_grad_raw, disp_q, grad_list
        )
        refined_disp, fused = DispRefine(
            downsample_factor=f, dtype=dt, name="disp_refine"
        )(disp_grad, disp_q, net_list[0], grad_ctx)

        delta_disp = jax.lax.stop_gradient(refined_disp - disp_q)
        net_list = (
            HiddenstateUpdater(cfg.context_dims[0], dtype=dt,
                               name="hiddenstate_update")(
                net_list[0], delta_disp.astype(dt)
            ),
        ) + tuple(net_list[1:])

        # Convex upsampling + its mask head run OUTSIDE the scan (batched over
        # iterations in train mode, final-iteration-only in test mode).
        # Tag the carry so a remat-save policy ('iter_carry' in
        # TrainConfig.remat_save_names) can checkpoint each iteration
        # boundary: the backward then recomputes one cell at a time from its
        # saved inputs instead of replaying the whole unrolled scan chain.
        from jax.ad_checkpoint import checkpoint_name

        net_list = tuple(checkpoint_name(n, "iter_carry") for n in net_list)
        refined_disp = checkpoint_name(refined_disp, "iter_carry")
        # 'iter_ys': the per-iteration refiner features consumed OUTSIDE the
        # scan by the convex-upsample mask head.
        ys = (disp_q, refined_disp, disp_grad,
              checkpoint_name(fused, "iter_ys"))
        return (net_list, refined_disp), ys


def _extract_features(cfg: ModelConfig, dt, img1, img2, packed: bool,
                      remat_encoder: bool):
    """Image→feature stage: context ladder + matching features.

    Must run inside a compact module scope; defines children named ``cnet`` /
    ``conv2`` / ``fnet``, so :class:`TCStereo` and :class:`TCSFeatureEncoder`
    share one parameter subtree. ``img1``/``img2`` are normalized (dt) images.
    Returns ``(cnet_list, fmap1, fmap2)`` with fmaps still in ``dt``.
    """
    if cfg.shared_backbone:
        # The packed (channel-stacked, block-diagonal) trunk and the
        # batch-stacked trunk share the SAME parameters (layers.Conv
        # ``dual`` expands weights at apply time) and are numerically
        # identical, so the layout is chosen per mode by measurement:
        # packed wins at B=1 inference (~1.6× encoder, 128-lane use at
        # the 64-ch stages); batch-stacked wins in training at recipe
        # batch sizes (2064 → 1739 ms/step on TartanAir b4 — the packed
        # convs do 2× the MACs and reformat poorly in the remat
        # backward).
        enc_cls = MultiBasicEncoder
        if remat_encoder:
            # Checkpoint the encoder as its own remat segment: the
            # backward recomputes just the trunk (instead of the whole
            # frame under TrainConfig.remat_frames) and only the 1/4-res
            # outputs are saved. static_argnums counts self as 0.
            enc_cls = nn.checkpoint(MultiBasicEncoder, prevent_cse=False,
                                    static_argnums=(2, 3))
        cnet_list, trunk = enc_cls(
            output_dims=(cfg.hidden_dims, cfg.context_dims),
            norm_fn=cfg.context_norm, dtype=dt,
            packed_dual=packed,
            conv1_s2d=cfg.conv1_s2d,
            name="cnet",
        )(jnp.concatenate([img1, img2], axis=0), True,
          cfg.n_gru_layers)
        fmap = SharedBackboneHead(dtype=dt, name="conv2")(trunk)
        fmap1, fmap2 = jnp.split(fmap, 2, axis=0)
    else:
        cnet_list, _ = MultiBasicEncoder(
            output_dims=(cfg.hidden_dims, cfg.context_dims),
            norm_fn=cfg.context_norm, dtype=dt,
            conv1_s2d=cfg.conv1_s2d, name="cnet",
        )(img1, dual_inp=False, num_layers=cfg.n_gru_layers)
        fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                            downsample=cfg.n_downsample, dtype=dt,
                            name="fnet")
        fmap1 = fnet(img1)
        fmap2 = fnet(img2)
    return cnet_list, fmap1, fmap2


class TCSFeatureEncoder(nn.Module):
    """The image→feature stage of :class:`TCStereo` as a standalone module.

    Shares TCStereo's parameter subtree (children are named identically:
    ``cnet``, ``conv2``, ``fnet``), so ``TCSFeatureEncoder(cfg).apply`` on a
    subset of — or the full — TCStereo variables computes exactly the features
    the full model would. Exists so the training step can hoist feature
    extraction OUT of the temporal frame scan and run it once, batched over
    all frames: inside the scan's while-loop + remat body the encoder's
    full-resolution convs measure ~3× their isolated cost (layout pressure;
    PERF.md), and their weight gradients accumulate per frame instead of
    contracting once over the (2·B·T) batch.
    """

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, image1, image2):
        """(N, H, W, 3) raw [0,255] image pairs → (cnet_list, fmap1, fmap2).

        Always the batch-stacked (training) trunk with no inner remat: the
        caller controls rematerialisation of this stage as a whole.
        """
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        img1 = (2.0 * (image1 / 255.0) - 1.0).astype(dt)
        img2 = (2.0 * (image2 / 255.0) - 1.0).astype(dt)
        return _extract_features(cfg, dt, img1, img2, packed=False,
                                 remat_encoder=False)


class TCSUpsampleMask(nn.Module):
    """The convex-upsample mask head as a standalone module.

    Shares TCStereo's parameter subtree (child named ``upsample_mask_head``),
    so the training step can hoist the mask head + convex upsampling + losses
    out of the temporal frame scan and run them once, batched over
    (frames · iterations · batch) — see ``TrainConfig.losses_outside_scan``.
    """

    cfg: ModelConfig = ModelConfig()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fused):
        return UpsampleMaskHead(
            downsample_factor=self.cfg.downsample_factor, dtype=self.dtype,
            name="upsample_mask_head",
        )(fused)


class TCStereo(nn.Module):
    """Iterative temporally-consistent stereo network."""

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, image1, image2, state: TemporalState, cam: CameraParams,
                 T, iters: int = 5, test_mode: bool = False,
                 features=None, raw_outputs: bool = False) -> TCStereoOutput:
        """Per-frame forward pass.

        Args:
          image1/image2: (B, H, W, 3) left/right frames in [0, 255].
          state: temporal state from the previous frame
            (``TemporalState.zeros`` + valid=False at sequence start).
          cam: camera intrinsics/baseline (full resolution).
          T: (B, 4, 4) current world→cam pose.
          iters: GRU iterations (static).
          test_mode: static; skips per-iteration training outputs.
          features: optional precomputed ``(cnet_list, fmap1, fmap2)`` from
            :class:`TCSFeatureEncoder` (same parameters); when given, the
            encoder stage is skipped entirely — used by the training step to
            hoist feature extraction out of the frame scan.
        """
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
        B, H, W, _ = image1.shape
        f = cfg.downsample_factor

        # The temporal carry is gradient-stopped where it is PRODUCED
        # (``new_state`` below; the reference detaches flow_q/net_list/fmap1
        # before carrying them, tc_stereo.py:221-242), so any cotangent this
        # frame's backward computes w.r.t. the incoming state is multiplied
        # by zero one frame earlier. Stopping it on the CONSUMER side as well
        # changes no gradient value but makes the frame-scan carry cotangent
        # structurally zero, so XLA dead-code-eliminates the whole chain —
        # the splat scatter-transpose while-loops and the hidden-warp
        # bilinear-sampler transposes — from the training backward.
        state = jax.tree_util.tree_map(jax.lax.stop_gradient, state)

        # --- context + matching features (bf16 conv stacks) ---
        if features is None:
            img1 = (2.0 * (image1 / 255.0) - 1.0).astype(dt)
            img2 = (2.0 * (image2 / 255.0) - 1.0).astype(dt)
            cnet_list, fmap1, fmap2 = _extract_features(
                cfg, dt, img1, img2,
                packed=cfg.packed_dual_encoder and test_mode,
                remat_encoder=cfg.remat_encoder and not test_mode,
            )
        else:
            cnet_list, fmap1, fmap2 = features
        fmap1 = fmap1.astype(jnp.float32)
        fmap2 = fmap2.astype(jnp.float32)

        # --- cost volume (fp32, MXU einsum) ---
        raw_cv = corr_ops.build_cost_volume(fmap1, fmap2)
        corr_dt = jnp.dtype(cfg.corr_dtype)
        if cfg.lookup_backend.startswith("onehot_w2major"):
            # Second MXU einsum producing the (B,H,W2,W1) layout directly —
            # per-tap reductions then run down the cheap sublane axis.
            raw_T = corr_ops.build_cost_volume_w2major(fmap1, fmap2)
            pyramid = tuple(
                lvl.astype(corr_dt)
                for lvl in corr_ops.corr_pyramid_w2major(raw_T, cfg.corr_levels)
            )
        else:
            pyramid = tuple(
                lvl.astype(corr_dt)
                for lvl in corr_ops.corr_pyramid(raw_cv, cfg.corr_levels)
            )
        cost_volume = corr_ops.masked_cost_volume(raw_cv)

        # --- temporal initialisation ---
        K_scale = geometry.scale_intrinsics(cam.K, cfg.scale_rate)
        K_scale_inv = jnp.linalg.inv(K_scale)

        def warp_path(_):
            relative_T = geometry.cal_relative_transformation(state.T_prev, T)
            # Single fused fp32 splat: a bf16 feature-splat variant
            # (geometry.warp(feature_dtype=bf16), which splits disparity and
            # features into two scatters) measured SLOWER on v5e — 37.0 vs
            # 36.4 ms/frame — the scatter is not bandwidth-bound and the
            # duplicated weight-channel scatter costs more than bf16 saves.
            warped_disp, warped_fmap1, sparse_mask = geometry.warp(
                state.disp_q, state.fmap1, relative_T, K_scale, K_scale_inv,
                cam.baseline, splat_backend=cfg.splat_backend,
            )
            cost = jnp.sum(
                corr_ops.l2_normalize(fmap1) * corr_ops.l2_normalize(warped_fmap1),
                axis=-1, keepdims=True,
            )
            return warped_disp, cost * sparse_mask, sparse_mask

        def argmax_path(_):
            return corr_ops.argmax_disp(
                cost_volume, margin=cfg.argmax_margin,
                suppress_radius=cfg.argmax_suppress_radius,
            )

        sparse_disp, cost, sparse_mask = jax.lax.cond(
            state.valid, warp_path, argmax_path, operand=None
        )
        # Tiny (B,h,w,1) tensors that gate the whole splat + pinhole-geometry
        # recompute in the remat backward: saving them ('frame_mid' in
        # TrainConfig.remat_save_names) costs <1 MB/frame.
        from jax.ad_checkpoint import checkpoint_name as _ckn

        sparse_disp = _ckn(sparse_disp, "frame_mid")
        cost = _ckn(cost, "frame_mid")
        sparse_mask = _ckn(sparse_mask, "frame_mid")

        # --- context projections ---
        inp_raw = [nn.relu(x[1]) for x in cnet_list]
        grad_list = tuple(
            Conv(64, 3, 1, 1, dtype=dt, name=f"context_zqr_convs_grad_{i}")(x)
            for i, x in enumerate(inp_raw)
        )
        inp_list = tuple(
            tuple(jnp.split(
                Conv(cfg.hidden_dims[i] * 3, 3, 1, 1, dtype=dt,
                     name=f"context_zqr_convs_{i}")(x),
                3, axis=-1,
            ))
            for i, x in enumerate(inp_raw)
        )
        net_raw = [x[0] for x in cnet_list]

        # --- disparity completion (bf16) ---
        disp_init, disp_mono, w_fuse, net_list = DisparityCompletor(
            dtype=dt, name="disp_completor"
        )(sparse_disp, jax.lax.stop_gradient(cost), sparse_mask, net_raw)
        disp_init = _ckn(disp_init, "frame_mid")
        disp_mono = _ckn(disp_mono, "frame_mid")
        w_fuse = _ckn(w_fuse, "frame_mid")
        net_list = [_ckn(n, "frame_mid") for n in net_list]

        # --- hidden-state temporal warp ---
        def warp_hidden(_):
            backward_grid = geometry.get_backward_grid(
                jax.lax.stop_gradient(disp_init),
                geometry.cal_relative_transformation(T, state.T_prev),
                K_scale, K_scale_inv, cam.baseline,
            )
            warped = []
            grid = backward_grid
            for net in state.net_list:
                warped.append(bilinear_sampler(net.astype(jnp.float32), grid))
                grid = 0.5 * resize_bilinear(
                    grid, (grid.shape[1] // 2, grid.shape[2] // 2)
                )
            return tuple(warped)

        def zero_hidden(_):
            return tuple(
                jnp.zeros_like(n, dtype=jnp.float32) for n in state.net_list
            )

        warped_net_list = jax.lax.cond(state.valid, warp_hidden, zero_hidden,
                                       operand=None)

        # --- hidden-state fusion (bf16) ---
        net_list = [nn.tanh(x) for x in net_list]
        net_list = tuple(
            LightFuse(cfg.hidden_dims[i], dtype=dt, name=f"hidden_fuse_{i}")(
                net, wnet.astype(dt)
            )
            for i, (net, wnet) in enumerate(zip(net_list, warped_net_list))
        )

        # --- iterative refinement (lifted scan, params broadcast) ---
        cell_cls = RefinementCell
        if cfg.remat_iter_cell and not test_mode:
            # Per-iteration remat: the backward saves only the scan carry
            # (hidden states + disparity) and recomputes each iteration's
            # internals — the standard scan-over-remat-cell pattern.
            cell_cls = nn.checkpoint(RefinementCell, prevent_cse=False)
        scan = nn.scan(
            cell_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=iters,
            unroll=min(cfg.scan_unroll, iters),
        )
        # Tag the scan's loop-invariant inputs ('iter_consts') and the initial
        # carry so the per-cell recompute (see RefinementCell) starts from
        # saved tensors rather than replaying the encoder/completor.
        from jax.ad_checkpoint import checkpoint_name as _ckname

        def _tag(t, name):
            return jax.tree_util.tree_map(lambda x: _ckname(x, name), t)

        (net_list, refined_disp), ys = scan(
            cfg=cfg, dtype=dt, name="iter_cell"
        )((_tag(net_list, "iter_consts"),
           _ckname(jax.lax.stop_gradient(disp_init), "iter_consts")),
          _tag((pyramid, inp_list, grad_list), "iter_consts"))
        disp_q_seq, refined_seq, grads_seq, fused_seq = ys

        mask_head = UpsampleMaskHead(downsample_factor=f, dtype=dt,
                                     name="upsample_mask_head")

        # --- assemble outputs ---
        new_state = TemporalState(
            disp_q=jax.lax.stop_gradient(jnp.maximum(refined_disp, 0.0)),
            net_list=tuple(
                jax.lax.stop_gradient(n.astype(jnp.float32)) for n in net_list
            ),
            fmap1=jax.lax.stop_gradient(fmap1),
            T_prev=T,
            valid=jnp.asarray(True),
        )

        if test_mode:
            # Mask head + convex upsample on the final iteration only.
            up_mask = mask_head(fused_seq[-1])
            final_flow = jnp.clip(
                convex_upsample(-refined_seq[-1], up_mask, f), None, 0.0
            )
            return TCStereoOutput(
                flow=final_flow,
                flow_predictions=None,
                flow_q_predictions=None,
                disp_grad_q_predictions=None,
                flow_init=None,
                flow_mono=None,
                cost_volume=None,
                new_state=new_state,
            )

        if raw_outputs:
            # Hoisted-loss training path: the mask head, convex upsampling
            # and loss evaluation run OUTSIDE the frame scan (train_step),
            # batched over frames — here only the per-iteration q-resolution
            # tensors are returned.
            return TCStereoOutput(
                flow=None,
                flow_predictions=None,
                flow_q_predictions=None,
                disp_grad_q_predictions=None,
                flow_init=None,
                flow_mono=None,
                cost_volume=cost_volume,
                new_state=new_state,
                raw=(disp_q_seq, refined_seq, grads_seq, fused_seq,
                     disp_init, disp_mono),
            )

        # Train: fold the iteration axis into the batch so the mask head and
        # upsampling run once over all iterations (identical numerics to
        # per-iteration application — they are per-pixel ops).
        n_it = disp_q_seq.shape[0]
        h, w = H // f, W // f

        def fold(x):
            return x.reshape(n_it * B, *x.shape[2:])

        up_mask = mask_head(fold(fused_seq))
        flows_up = convex_upsample(
            fold(-disp_q_seq), jax.lax.stop_gradient(up_mask), f
        ).reshape(n_it, B, H, W, 1)
        flow_refine_up = convex_upsample(
            fold(-refined_seq), up_mask, f
        ).reshape(n_it, B, H, W, 1)

        return TCStereoOutput(
            flow=jnp.clip(flow_refine_up[-1], None, 0.0),
            flow_predictions=(flows_up, flow_refine_up),
            flow_q_predictions=(-disp_q_seq, -refined_seq),
            disp_grad_q_predictions=grads_seq,
            flow_init=-float(f) * resize_bilinear(disp_init, (H, W)),
            flow_mono=-float(f) * resize_bilinear(disp_mono, (H, W)),
            cost_volume=cost_volume,
            new_state=new_state,
        )
