"""Jitted training / eval steps with frame-scan BPTT.

The reference trains temporally by looping Python-side over ``frame_length``
frames, calling backward per frame to accumulate gradients, with temporal
carries detached (``train_stereo.py:348-411``). Because the carries are
gradient-stopped, accumulating per-frame gradients equals differentiating the
*sum* of per-frame losses once — so here the whole window is a single
``lax.scan`` inside one jitted step: XLA sees the full graph, fuses across
frames, and inserts the DP gradient all-reduce automatically when the batch is
sharded over the mesh.

Loss weighting mirrors ``train_stereo.py:364-405``:
  total = Σ_frames (seq + init + 0.25·normal + 5·grad) / frame_length.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax.training import train_state as flax_train_state

from tcs_tpu import losses as L
from tcs_tpu.config import TrainConfig
from tcs_tpu.geometry import disp2disp_gradient_xy
from tcs_tpu.models.tc_stereo import (
    CameraParams,
    TCSFeatureEncoder,
    TCStereo,
    TCSUpsampleMask,
    TemporalState,
)
from tcs_tpu.ops.sampler import convex_upsample, resize_bilinear


class FrameBatch(struct.PyTreeNode):
    """One temporal frame for every sequence in the batch."""

    image1: jax.Array  # (B, H, W, 3) float32 in [0,255]
    image2: jax.Array  # (B, H, W, 3)
    flow: jax.Array  # (B, H, W, 1) GT flow (−disp)
    valid: jax.Array  # (B, H, W, 1) float 0/1
    T: jax.Array  # (B, 4, 4) world→cam pose


class SequenceBatch(struct.PyTreeNode):
    """A batch of fixed-length stereo video clips (time-major inner axis)."""

    image1: jax.Array  # (B, T, H, W, 3)
    image2: jax.Array  # (B, T, H, W, 3)
    flow: jax.Array  # (B, T, H, W, 1)
    valid: jax.Array  # (B, T, H, W, 1)
    T: jax.Array  # (B, T, 4, 4)
    K: jax.Array  # (B, 3, 3)
    baseline: jax.Array  # (B,)

    def frame(self, t):
        return FrameBatch(
            image1=self.image1[:, t], image2=self.image2[:, t],
            flow=self.flow[:, t], valid=self.valid[:, t], T=self.T[:, t],
        )


class TrainState(flax_train_state.TrainState):
    pass


def frame_losses(out, frame: FrameBatch, cfg: TrainConfig):
    """All four losses for one frame (reference train_stereo.py:363-399)."""
    return frame_losses_parts(
        out.flow_predictions, out.flow_q_predictions,
        out.disp_grad_q_predictions, out.flow_init, out.flow_mono,
        out.cost_volume, frame, cfg,
    )


def frame_losses_parts(flow_predictions, flow_q_predictions,
                       disp_grad_q_predictions, flow_init, flow_mono,
                       cost_volume, frame: FrameBatch, cfg: TrainConfig):
    """Loss body on bare prediction tensors (vmapped over frames by the
    hoisted-loss path; see :func:`frame_losses` for the Output-struct form).
    Masked means are normalised by each frame's OWN valid count (matching the
    reference's per-frame loss accumulation), which is why the hoisted path
    vmaps this per frame instead of folding frames into the batch axis."""
    weights = L.loss_weights(flow_predictions[0].shape[0], cfg.loss_gamma)
    scale = cfg.model.scale_rate

    from jax.ad_checkpoint import checkpoint_name

    mag = jnp.sqrt(jnp.sum(frame.flow ** 2, axis=-1, keepdims=True))
    valid = ((frame.valid >= 0.5) & (mag < 700.0))
    # GT-side tensors carry no gradients; the 'loss_gt' tags save them under
    # frame remat so the backward replay skips recomputing the full-res
    # forward differences / normalisation (and, via the tags inside the loss
    # functions, the GT median pools and the init-loss band selection).
    valid = checkpoint_name(valid, "loss_gt")

    grad_gt, _ = disp2disp_gradient_xy(-frame.flow)
    norm_gt = jnp.concatenate([grad_gt, -jnp.ones_like(grad_gt[..., :1])], axis=-1)
    norm_gt = norm_gt / jnp.maximum(
        jnp.linalg.norm(norm_gt, axis=-1, keepdims=True), 1e-12
    )
    grad_gt = checkpoint_name(grad_gt, "loss_gt")
    norm_gt = checkpoint_name(norm_gt, "loss_gt")

    dense_gt = cfg.train_dataset != "kitti_raw"

    seq_loss, seq_metrics = L.sequence_loss(
        flow_mono, flow_init, flow_predictions, frame.flow, valid,
        weights,
    )
    in_loss, init_metrics = L.init_loss(
        cost_volume, frame.flow, valid, k=cfg.init_k, scale=scale,
        threshold=cfg.model.init_thres,
    )
    norm_loss, norm_metrics = L.disp_normal_loss(
        flow_q_predictions, norm_gt, valid, weights, scale=scale,
        dense_gt=dense_gt,
    )
    grad_loss, grad_metrics = L.disp_grad_loss(
        disp_grad_q_predictions, grad_gt, valid, weights, scale=scale,
        dense_gt=dense_gt,
    )
    total = (
        seq_loss
        + in_loss
        + cfg.normal_loss_weight * norm_loss
        + cfg.grad_loss_weight * grad_loss
    )
    metrics = {**seq_metrics, **init_metrics, **norm_metrics, **grad_metrics}
    return total, metrics


def _hoisted_losses_tail(cfg: TrainConfig, params, raw, cost_volume, frames,
                         B, Tn, H, W):
    """Mask head + convex upsample + the four losses, batched over
    (frames · iterations · batch). ``raw`` leaves are (T, it, B, h, w, c)
    (disp_init/disp_mono: (T, B, h, w, 1)); ``cost_volume`` is
    (T, B, h, w, W2); ``frames`` is a T-major FrameBatch."""
    (disp_q_seq, refined_seq, grads_seq, fused_seq,
     disp_init, disp_mono) = raw
    n_it = cfg.train_iters
    f = cfg.model.downsample_factor
    h, w = H // f, W // f
    dt = jnp.bfloat16 if cfg.model.mixed_precision else jnp.float32

    def fold(x):  # (T, it, B, h, w, c) → (T·it·B, h, w, c)
        return x.reshape(Tn * n_it * B, *x.shape[3:])

    head_params = {"params": {
        "upsample_mask_head": params["params"]["upsample_mask_head"]
    }}
    up_mask = TCSUpsampleMask(cfg.model, dtype=dt).apply(
        head_params, fold(fused_seq))
    flows_up = convex_upsample(
        fold(-disp_q_seq), jax.lax.stop_gradient(up_mask), f,
    ).reshape(Tn, n_it, B, H, W, 1)
    flow_refine_up = convex_upsample(
        fold(-refined_seq), up_mask, f,
    ).reshape(Tn, n_it, B, H, W, 1)
    flow_init_full = -float(f) * resize_bilinear(
        disp_init.reshape(Tn * B, h, w, 1), (H, W),
    ).reshape(Tn, B, H, W, 1)
    flow_mono_full = -float(f) * resize_bilinear(
        disp_mono.reshape(Tn * B, h, w, 1), (H, W),
    ).reshape(Tn, B, H, W, 1)

    # Per-frame losses via vmap over the frame axis: masked means keep each
    # frame's own valid-count denominator (see frame_losses_parts), exactly
    # like the in-scan path.
    def per_frame(fu, fru, dq, rf, gr, fi, fm, cv, frame):
        return frame_losses_parts(
            (fu, fru), (-dq, -rf), gr, fi, fm, cv, frame, cfg)

    return jax.vmap(per_frame)(
        flows_up, flow_refine_up, disp_q_seq, refined_seq,
        grads_seq, flow_init_full, flow_mono_full, cost_volume, frames)


def _frame_parallel_loss(model: TCStereo, cfg: TrainConfig, params, frames,
                         feats_t, cam: CameraParams,
                         init_state: TemporalState):
    """Two-phase frame-parallel loss (``TrainConfig.frame_parallel_backward``).

    The temporal carries are stop-gradient on both sides, so the per-frame
    losses — given each frame's incoming state — are independent functions
    of the parameters. Phase A runs the sequential frame scan with gradients
    severed purely to COLLECT the incoming states; Phase B recomputes every
    frame's forward with the frame axis folded into the batch axis (frame 0
    in the bootstrap group, frames 1..T−1 in one temporal group, since
    ``TemporalState.valid`` is a group-uniform scalar) and evaluates the
    hoisted losses on that. ``jax.grad`` then differentiates ONE big-batch
    program instead of transposing a sequential scan-of-remat: conv weight
    gradients contract once over (T−1)·B samples, and the backward has no
    while loop, no scan-boundary carry copies and no checkpoint replay.
    FLOP-neutral vs the remat path (Phase A replaces the backward's frame
    recompute); numerics equal up to fp reassociation (equivalence-tested).
    """
    B = frames.image1.shape[1]
    Tn = frames.image1.shape[0]
    H, W = frames.image1.shape[2:4]
    sg = jax.lax.stop_gradient

    # --- Phase A: collect incoming temporal states (gradient-free) ---
    def collect(state, xs):
        frame, feat = xs
        out = model.apply(
            sg(params), frame.image1, frame.image2, state, cam, frame.T,
            iters=cfg.train_iters, test_mode=False,
            features=None if feat is None else jax.tree_util.tree_map(sg, feat),
            raw_outputs=True,
        )
        return out.new_state, state  # emit the INCOMING state

    _, states_in = jax.lax.scan(collect, init_state, (frames, feats_t))
    states_in = sg(states_in)

    # --- Phase B: all frames' differentiable forwards, frame axis folded
    # into batch. Group 0 = frame 0 (bootstrap, valid=False); group 1 =
    # frames 1..T−1 (temporal, valid=True). ---
    def tb(x):  # (T', B, ...) → (T'·B, ...)
        return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])

    def head(tree):  # frame 0 slice
        return jax.tree_util.tree_map(lambda x: x[0], tree)

    def tail_fold(tree):  # frames 1..T−1 folded
        return jax.tree_util.tree_map(lambda x: tb(x[1:]), tree)

    def run(frames_g, feats_g, state_g, n_rep):
        cam_g = CameraParams(
            K=jnp.concatenate([cam.K] * n_rep, axis=0),
            baseline=jnp.concatenate([cam.baseline] * n_rep, axis=0),
        )

        def fwd(p, fg):
            out = model.apply(
                p, frames_g.image1, frames_g.image2, state_g, cam_g,
                frames_g.T, iters=cfg.train_iters, test_mode=False,
                features=fg, raw_outputs=True,
            )
            return out.raw, out.cost_volume

        # Memory control (a (T−1)·B-batch frame body's forward+backward
        # temps do not fit HBM concurrently — measured 34-35 G of 15.75 G):
        # with cfg.remat_frames, checkpoint the whole group (saves only the
        # q-resolution raw outputs; the backward replays the batched forward
        # once, keeping the tagged iteration boundaries per the save-names
        # policy). Without it (remat-mode 'cell'), rely on
        # model.remat_iter_cell + a rolled iteration scan: the forward's
        # non-iteration intermediates (cost volume, completor, warp) are
        # saved rather than replayed and only the per-iteration cells
        # recompute — less replay, more residency.
        if not cfg.remat_frames:
            return fwd(params, feats_g)
        policy = None
        if cfg.remat_save_names:
            policy = jax.checkpoint_policies.save_only_these_names(
                *cfg.remat_save_names)
        return jax.checkpoint(fwd, prevent_cse=False, policy=policy)(
            params, feats_g)

    state0 = TemporalState(
        disp_q=states_in.disp_q[0], net_list=tuple(n[0] for n in
                                                   states_in.net_list),
        fmap1=states_in.fmap1[0], T_prev=states_in.T_prev[0],
        valid=jnp.asarray(False),
    )
    raw0, cv0 = run(head(frames), None if feats_t is None else head(feats_t),
                    state0, 1)
    state1 = TemporalState(
        disp_q=tb(states_in.disp_q[1:]),
        net_list=tuple(tb(n[1:]) for n in states_in.net_list),
        fmap1=tb(states_in.fmap1[1:]), T_prev=tb(states_in.T_prev[1:]),
        valid=jnp.asarray(True),
    )
    raw1, cv1 = run(tail_fold(frames),
                    None if feats_t is None else tail_fold(feats_t),
                    state1, Tn - 1)

    # Stitch groups back to the (T, it, B, ...) layout of the scan path.
    def stitch_it(a, b):  # (it, B, ...) + (it, (T−1)B, ...) → (T, it, B, ...)
        x = jnp.concatenate([a, b], axis=1)
        x = x.reshape(x.shape[0], Tn, B, *x.shape[2:])
        return jnp.swapaxes(x, 0, 1)

    def stitch_b(a, b):  # (B, ...) + ((T−1)B, ...) → (T, B, ...)
        x = jnp.concatenate([a, b], axis=0)
        return x.reshape(Tn, B, *x.shape[1:])

    # raw = (disp_q_seq, refined_seq, grads_seq, fused_seq, disp_init,
    # disp_mono): the first four carry a leading iteration axis.
    raw = tuple(
        stitch_it(a, b) if i < 4 else stitch_b(a, b)
        for i, (a, b) in enumerate(zip(raw0, raw1))
    )
    cost_volume = stitch_b(cv0, cv1)

    # Loss tail as a per-frame scan-of-remat: the convex-upsample backward
    # materialises (it·B, h, 4, w, 4, ·) fp32 product temps — ~3.7 GB if all
    # T frames' tails are live at once (they pushed Phase B 0.26 G over
    # HBM). One frame at a time bounds that to ~0.9 GB; the tail's replay is
    # cheap elementwise work and the GT-side tensors stay saved via the
    # 'loss_gt' tags.
    def tail_body(carry, xs):
        raw_f, cv_f, frame_f = xs
        raw_1 = jax.tree_util.tree_map(lambda x: x[None], raw_f)
        cv_1 = cv_f[None]
        frame_1 = jax.tree_util.tree_map(lambda x: x[None], frame_f)
        fl, mets = _hoisted_losses_tail(cfg, params, raw_1, cv_1, frame_1,
                                        B, 1, H, W)
        return carry, (fl[0], jax.tree_util.tree_map(lambda m: m[0], mets))

    tail_body = jax.checkpoint(
        tail_body, prevent_cse=False,
        policy=jax.checkpoint_policies.save_only_these_names("loss_gt"),
    )
    _, (frame_loss, metrics) = jax.lax.scan(
        tail_body, (), (raw, cost_volume, frames))
    loss = jnp.mean(frame_loss)
    metrics = jax.tree_util.tree_map(jnp.mean, metrics)
    return loss, metrics


def _encode_frames_chunked(cfg: TrainConfig, enc_params, batch: SequenceBatch,
                           B, Tn):
    """The hoisted image→feature stage: one chunked, checkpointed lax.scan
    over the (B·T) frame batch, returning (T, B, ...) per-frame features.

    Hoisting rationale (PERF.md round 3): inside the frame scan's while-loop
    + remat body the encoder's full-resolution convs measure ~3× their
    isolated cost and their weight gradients accumulate per frame; here the
    trunk runs batched, and jax.checkpoint keeps only its (1/4-res and
    coarser) outputs for the backward. Chunked because the full (B·T)-batch
    replay transient (~4 GB of full-resolution trunk intermediates at the
    TartanAir recipe) overflows HBM, and independent per-chunk checkpoint
    calls OVERLAP their backward replays (measured 29.5 G peak); a dedicated
    lax.scan over chunks serializes them."""
    nc = min(cfg.encode_chunk_frames, Tn)
    while Tn % nc:
        nc -= 1
    if nc != cfg.encode_chunk_frames:
        # The chunk scan needs equal chunks; a non-dividing setting silently
        # degrades the batching win (worst case 1 frame/chunk), so surface
        # the effective size once per trace.
        logging.getLogger(__name__).warning(
            "encode_chunk_frames=%d does not divide frame_length=%d;"
            " using effective chunk size %d",
            cfg.encode_chunk_frames, Tn, nc)
    n_chunks = Tn // nc

    def to_chunks(x):
        y = x.reshape(B, n_chunks, nc, *x.shape[2:])
        y = jnp.moveaxis(y, 1, 0)  # (n_chunks, B, nc, ...)
        return y.reshape(n_chunks, B * nc, *x.shape[2:])

    def enc_body(carry, ims):
        f = TCSFeatureEncoder(cfg.model).apply(enc_params, *ims)
        return carry, f

    enc_policy = None
    if cfg.encode_save_names:
        # Save named trunk activations ('enc_inner'/'enc_conv1'/…) so the
        # encoder backward skips (part of) its forward replay — ~80 MB per
        # saved full-resolution tensor per chunk at the TartanAir recipe.
        enc_policy = jax.checkpoint_policies.save_only_these_names(
            *cfg.encode_save_names)
    if cfg.encode_remat:
        enc_body = jax.checkpoint(enc_body, prevent_cse=False,
                                  policy=enc_policy)
    _, feats_c = jax.lax.scan(
        enc_body, (), (to_chunks(batch.image1), to_chunks(batch.image2)))

    def to_frames(x):
        y = x.reshape(n_chunks, B, nc, *x.shape[2:])
        y = jnp.moveaxis(y, 2, 1)  # (n_chunks, nc, B, ...)
        return y.reshape(Tn, B, *x.shape[2:])

    return jax.tree_util.tree_map(to_frames, feats_c)


def _enc_param_subtree(params):
    return {
        "params": {
            k: v for k, v in params["params"].items()
            if k in ("cnet", "conv2", "fnet")
        }
    }


def _frame_inline_loss_and_grads(model: TCStereo, cfg: TrainConfig, params,
                                 batch: SequenceBatch):
    """Per-frame gradients accumulated INSIDE the forward frame scan
    (``TrainConfig.frame_inline_backward``).

    The temporal carries are stop-gradient on both sides (reference detaches
    them, tc_stereo.py:221-242), so ∂total/∂θ = Σ_t ∂loss_t/∂θ with each
    term independent of the others given frame t's incoming state. Instead
    of differentiating THROUGH the frame scan (XLA's scan transpose: a
    backward while loop with boundary carry copies, saved-ys dynamic
    slicing, and a full remat replay of each frame's forward — the ~66 ms of
    formatting plus ~330 ms of recompute PERF.md attributes to the
    scan-of-remat machinery), the scan body itself computes
    ``value_and_grad`` of frame t's loss: the primal forward that produces
    the carried state doubles as the gradient pass's forward, so each
    frame's forward runs ONCE (no replay), and the scan is never transposed
    (its carry — the temporal state plus a parameter-shaped gradient
    accumulator, ~67 MB fp32 — is forward-only).

    The hoisted encoder keeps its own chunked-checkpoint structure via an
    explicit ``jax.vjp``: the frame bodies emit per-frame feature cotangents
    as scan outputs, and the encoder pullback contracts them after the scan
    (equivalent to what the outer differentiation did implicitly).

    Numerics: identical to the scan path up to fp reassociation — per-frame
    loss tails run at (it·B) batch instead of the hoisted (T·it·B) fold, and
    weight gradients are accumulated frame-by-frame exactly as the scan
    transpose accumulates them (equivalence-tested in tests/test_train.py).
    """
    B, Tn, H, W, _ = batch.image1.shape
    cam = CameraParams(K=batch.K, baseline=batch.baseline)
    init_state = TemporalState.zeros(B, H, W, cfg.model)

    feats_t = None
    enc_vjp = None
    if cfg.encode_outside_scan:
        enc_params = _enc_param_subtree(params)
        # Explicit vjp so the frame bodies can treat the features as plain
        # scan inputs; their gradient path to the encoder goes through the
        # cotangent ys contracted by the pullback after the scan.
        feats_t, enc_vjp = jax.vjp(
            lambda ep: _encode_frames_chunked(cfg, ep, batch, B, Tn),
            enc_params)

    frames = jax.tree_util.tree_map(
        lambda x: jnp.swapaxes(x, 0, 1),
        FrameBatch(batch.image1, batch.image2, batch.flow, batch.valid,
                   batch.T),
    )

    tail_policy = jax.checkpoint_policies.save_only_these_names("loss_gt")

    def frame_loss(p, feat, frame, state):
        out = model.apply(
            p, frame.image1, frame.image2, state, cam, frame.T,
            iters=cfg.train_iters, test_mode=False, features=feat,
            raw_outputs=True,
        )
        raw1 = jax.tree_util.tree_map(lambda x: x[None], out.raw)
        cv1 = out.cost_volume[None]
        fr1 = jax.tree_util.tree_map(lambda x: x[None], frame)

        # Same per-frame loss-tail remat as the other paths: the
        # convex-upsample backward's (it·B, h, 4, w, 4, ·) fp32 product
        # temps (~0.9 GB/frame) are replayed, GT-side tensors stay saved.
        def tail(pp, rr, cc):
            return _hoisted_losses_tail(cfg, pp, rr, cc, fr1, B, 1, H, W)

        if cfg.inline_tail_remat:
            tail = jax.checkpoint(tail, prevent_cse=False,
                                  policy=tail_policy)
        fl, mets = tail(p, raw1, cv1)
        mets = jax.tree_util.tree_map(lambda m: m[0], mets)
        return fl[0], (out.new_state, mets)

    with_feats = feats_t is not None
    grad_fn = jax.value_and_grad(
        frame_loss, argnums=(0, 1) if with_feats else (0,), has_aux=True)

    def body(carry, xs):
        state, gacc = carry
        frame, feat = xs
        (fl, (new_state, mets)), grads = grad_fn(params, feat, frame, state)
        gacc = jax.tree_util.tree_map(jnp.add, gacc, grads[0])
        ys = (fl, mets, grads[1]) if with_feats else (fl, mets)
        return (new_state, gacc), ys

    gacc0 = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.result_type(p, jnp.float32)), params)
    (_, gacc), ys = jax.lax.scan(
        body, (init_state, gacc0), (frames, feats_t),
        unroll=min(cfg.frame_unroll, cfg.frame_length))

    if with_feats:
        frame_loss_v, metrics, feat_cts = ys
    else:
        frame_loss_v, metrics = ys

    loss = jnp.mean(frame_loss_v)  # Σ/frame_length
    metrics = jax.tree_util.tree_map(jnp.mean, metrics)
    inv_t = 1.0 / Tn
    grads = jax.tree_util.tree_map(lambda g: g * inv_t, gacc)

    if with_feats:
        (enc_grads,) = enc_vjp(
            jax.tree_util.tree_map(lambda g: g * inv_t, feat_cts))
        merged = dict(grads["params"])
        for k, v in enc_grads["params"].items():
            merged[k] = jax.tree_util.tree_map(jnp.add, merged[k], v)
        grads = {**grads, "params": merged}
    return loss, metrics, grads


def make_train_step(model: TCStereo, cfg: TrainConfig,
                    donate: bool = True) -> Callable:
    """Build the jitted train step: (TrainState, SequenceBatch) → (TrainState,
    metrics). Frame windows are scanned with remat to bound activation memory.
    """

    def loss_fn(params, batch: SequenceBatch):
        B, Tn, H, W, _ = batch.image1.shape
        cam = CameraParams(K=batch.K, baseline=batch.baseline)
        init_state = TemporalState.zeros(B, H, W, cfg.model)

        feats_t = None
        if cfg.encode_outside_scan:
            feats_t = _encode_frames_chunked(
                cfg, _enc_param_subtree(params), batch, B, Tn)

        hoist_losses = cfg.losses_outside_scan

        frames = jax.tree_util.tree_map(
            lambda x: jnp.swapaxes(x, 0, 1),
            FrameBatch(batch.image1, batch.image2, batch.flow, batch.valid,
                       batch.T),
        )

        if cfg.frame_parallel_backward:
            if Tn > 1 and hoist_losses:
                return _frame_parallel_loss(model, cfg, params, frames,
                                            feats_t, cam, init_state)
            # The two-phase formulation needs the hoisted loss tail and a
            # multi-frame window; silently falling back would benchmark the
            # wrong formulation while the user believes the knob is active.
            logging.getLogger(__name__).warning(
                "frame_parallel_backward requires losses_outside_scan and "
                "frame_length>1 (got losses_outside_scan=%s, frame_length=%d);"
                " falling back to the sequential frame scan",
                hoist_losses, Tn)

        def frame_step(state, xs):
            frame, feat = xs
            out = model.apply(
                params, frame.image1, frame.image2, state, cam, frame.T,
                iters=cfg.train_iters, test_mode=False, features=feat,
                raw_outputs=hoist_losses,
            )
            if hoist_losses:
                # Mask head / upsampling / losses run after the scan, batched
                # over frames; the scan emits only q-resolution tensors.
                return out.new_state, (out.raw, out.cost_volume)
            floss, metrics = frame_losses(out, frame, cfg)
            return out.new_state, (floss, metrics)

        if cfg.remat_frames:
            policy = None
            if cfg.remat_save_names:
                policy = jax.checkpoint_policies.save_only_these_names(
                    *cfg.remat_save_names
                )
            frame_step = jax.checkpoint(frame_step, prevent_cse=False,
                                        policy=policy)

        _, ys = jax.lax.scan(
            frame_step, init_state, (frames, feats_t),
            unroll=min(cfg.frame_unroll, cfg.frame_length),
            # Experimental XLA option: transpose the scan as two loops (one
            # recomputation sweep + one cotangent-accumulation sweep)
            # instead of one fused backward while loop — changes where the
            # boundary copies land. Measured on the TartanAir recipe
            # (PERF.md round 4).
            _split_transpose=cfg.frame_scan_split_transpose)

        if hoist_losses:
            raw, cost_volume = ys
            frame_loss, metrics = _hoisted_losses_tail(
                cfg, params, raw, cost_volume, frames, B, Tn, H, W)
        else:
            frame_loss, metrics = ys
        loss = jnp.mean(frame_loss)  # Σ/frame_length
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        return loss, metrics

    # Static path selection: frame_parallel_backward is default-off, so
    # setting it is an explicit opt-in that overrides the default-on inline
    # formulation (both harvest the same frame-independence property).
    use_inline = cfg.frame_inline_backward and not cfg.frame_parallel_backward
    if cfg.frame_inline_backward and cfg.frame_parallel_backward:
        logging.getLogger(__name__).warning(
            "frame_parallel_backward and frame_inline_backward are both set;"
            " using frame_parallel_backward (explicit opt-in over the"
            " default-on inline formulation)")

    def train_step(state: TrainState, batch: SequenceBatch):
        if use_inline:
            loss, metrics, grads = _frame_inline_loss_and_grads(
                model, cfg, state.params, batch)
        else:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads=grads)
        metrics = dict(metrics)
        metrics["live_loss"] = loss
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def make_eval_step(model: TCStereo, iters: int = 5,
                   donate_state: bool = False) -> Callable:
    """Jitted single-frame test-mode forward: returns (flow_fullres ≤ 0,
    new TemporalState). One compiled function serves first and subsequent
    frames via the state validity flag. ``donate_state`` donates the incoming
    state buffers (the caller always replaces them with the returned state);
    measured slightly SLOWER on v5e via the axon runtime (57.9 vs 44.6
    ms/frame at 384×1280), so off by default — re-evaluate on direct PJRT."""

    @functools.partial(jax.jit, donate_argnums=(3,) if donate_state else ())
    def eval_step(params, image1, image2, state: TemporalState,
                  cam: CameraParams, T):
        out = model.apply(params, image1, image2, state, cam, T, iters=iters,
                          test_mode=True)
        return out.flow, out.new_state

    return eval_step
