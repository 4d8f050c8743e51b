"""Typed configuration for TC-Stereo TPU.

The reference drives everything through argparse flags duplicated between
``train_stereo.py:455-499`` and ``evaluate_stereo.py:354-373``, with the three
launch scripts acting as de-facto config files. Here a single pair of frozen
dataclasses replaces that: :class:`ModelConfig` (architecture) and
:class:`TrainConfig` (recipe), with presets mirroring the three scripts
(``sceneflow_ddp_train.sh``, ``tartanair_ddp_train.sh``, ``KITTI_ddp_train.sh``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (reference ``train_stereo.py:480-487``)."""

    hidden_dims: Tuple[int, ...] = (128, 128, 128)
    context_dims: Tuple[int, ...] = (128, 128, 128)
    corr_levels: int = 4
    corr_radius: int = 4
    n_downsample: int = 2  # disparity field lives at 1/2**n_downsample resolution
    n_gru_layers: int = 3
    context_norm: str = "none"  # {'group','batch','instance','none'}
    shared_backbone: bool = True
    slow_fast_gru: bool = False  # no launch script enables it
    mixed_precision: bool = True  # bf16 conv blocks, fp32 correlation/geometry
    # Threshold used by the cost-volume contrastive loss (``--init_thres``).
    init_thres: float = 0.5
    # Margin used by the sparse argmax bootstrap. The reference hard-codes 0.3
    # in ``core/corr.py:73`` even though ``--init_thres`` is plumbed into the
    # CorrBlock; we preserve that behaviour but make it explicit.
    argmax_margin: float = 0.3
    # Max candidate disparity band suppressed around the main peak (px).
    argmax_suppress_radius: float = 1.5
    # lax.scan unroll factor for the GRU iteration loop (clamped to `iters`).
    # Unroll factor of the GRU-iteration nn.scan. History: unrolling (5) won
    # under the differentiated-scan train formulation (2188.5 → 2064.3
    # ms/step round 1; re-confirmed rounds 3/4 — use 5 when selecting
    # frame_inline_backward=False). Under the round-5 frame-INLINE backward
    # the ROLLED scan wins on every recipe — TartanAir 1371.4 → 1346.4,
    # SceneFlow 522.0 → 498.4, KITTI_raw 1522.9 → 1426.9 ms/step — and
    # inference is neutral (29.43 vs 29.44 f/s), so 1 is the default.
    # May change bf16 rounding at fusion boundaries (loss Δ ~1e-4 relative).
    scan_unroll: int = 1
    # Shared-backbone trunk with the two images packed along channels instead
    # of stacked on batch: exact numerics (block-diagonal kernels built from
    # the SAME stored weights at apply time), full 128-lane utilisation for
    # the 64-channel full-res stages (~1.6× faster at B=1 inference on v5e).
    # Applied in test_mode only — in training at recipe batch sizes the
    # batch-stacked trunk measured 2064 → 1739 ms/step faster (the packed
    # convs do 2× the MACs and reformat poorly in the remat backward).
    # Requires per-channel norms ('none'/'instance').
    packed_dual_encoder: bool = True
    # Correlation lookup backend. Measured ms/frame at 384×1280 on v5e:
    # 'onehot_w2major' (dense one-hot with the cost volume in (B,H,W2,W1)
    # layout so per-tap reductions run down the cheap sublane axis) 36.4 —
    # the default; 'onehot' (lane-axis reductions) 38.3; 'pallas' (fused
    # VMEM integer-tap kernel) 48.3; 'roll' 49.8; 'window' / 'gather'
    # (gather-based oracles) slower still. All variants are numerically
    # identical (tests/test_corr.py, tests/test_pallas.py).
    lookup_backend: str = "onehot_w2major"
    # Softmax-splat scatter backend: 'xla' (four per-tap scatter-adds),
    # 'xla_fused' (one combining scatter over all 4 taps — measured tied),
    # or 'xla_aligned' (128-lane-aligned split: 256-ch feature scatter +
    # 2-ch disp/weight scatter — measured 34.7 vs 34.0 ms/frame: the TPU
    # scatter is collision-serialisation-bound, not tile-alignment-bound).
    splat_backend: str = "xla"
    # Selective rematerialisation INSIDE the per-frame forward (used by the
    # training step as an alternative to whole-frame remat, which recomputes
    # the entire frame — ~800 ms of the TartanAir-recipe backward — when only
    # the encoder's full/half-res activations actually blow the HBM budget):
    # ``remat_encoder`` checkpoints the context/feature encoder (saves only
    # its 1/4-res outputs, ~120 MB/frame at recipe shapes), ``remat_iter_cell``
    # checkpoints each GRU/refinement iteration (saves only the scan carry).
    # Both are numerics-preserving. No effect at inference (no backward).
    remat_encoder: bool = False
    remat_iter_cell: bool = False
    # Space-to-depth factor for the encoder's 7×7 stem conv in the
    # batch-stacked trunk (training / non-packed paths). The 6-channel 7×7
    # conv runs at ~2% MXU utilisation (20.5 ms/step forward on the TartanAir
    # recipe); s=4 rearranges the SAME weights into a (3,3,96,1024) block
    # conv (layers.Conv.s2d) that runs AT peak (4.1 ms) — but the s2d/d2s
    # layout transposes around it cost ~32 ms/step on v5e, a net wash
    # (1759 vs 1740 ms/step measured), so the default stays off. Identical
    # math, fp reduction order differs (as between any two conv emitters).
    conv1_s2d: int = 1
    # Space-to-depth factor for the motion encoder's 7×7 conv on the
    # 1-channel flow (convf1, 1 of 128 MXU lanes otherwise). Measured
    # slightly WORSE at inference (34.09 vs 33.96 ms/frame — the conv is only
    # ~0.06 ms/iter and the reshape boundaries eat the gain) and notably
    # slower to compile; default off, kept as a tested knob.
    flow_stem_s2d: int = 1
    # Zero-pad the 36-channel corr-lookup features (and convc1's kernel input
    # rows) up to a multiple of this at apply time (layers.Conv.in_pad).
    # Exact numerics, no param/checkpoint change. The unaligned 36-lane minor
    # dim pushes convc1's backward off the MXU into VPU loop fusions +
    # relayout copies (~48 ms/step of the TartanAir train step in the
    # per-op trace).
    corr_pad: int = 1
    # Storage dtype of the lookup pyramid ONLY (the masked cost volume used by
    # the argmax bootstrap and the init loss stays fp32). The XLA one-hot
    # lookup is HBM-bound on re-reading the pyramid once per tap (~635 MB per
    # GRU iteration at 384×1280 fp32), so bf16 halves its cost. Numerically
    # benign: every one-hot reduction has exactly two nonzero terms (no
    # accumulation error) and the lookup output feeds straight into bf16
    # convs. Set 'float32' for bit-exact parity with the reference.
    corr_dtype: str = "bfloat16"

    def __post_init__(self):
        if self.n_gru_layers != 3:
            # Faithful to the reference: its DisparityCompletor hard-indexes
            # all three context scales (update.py:379-396 context_list[2])
            # and its 3-scale decoder is built unconditionally, so any
            # --n_gru_layers other than 3 crashes the reference model too.
            # Reject it up front with the reason instead of an IndexError
            # deep inside the completor.
            raise ValueError(
                f"n_gru_layers={self.n_gru_layers}: the TC-Stereo"
                " architecture requires exactly 3 GRU/context scales — the"
                " reference's DisparityCompletor consumes context_list[0..2]"
                " unconditionally (reference core/update.py:379-396), so"
                " this flag value does not run there either")

    @property
    def scale_rate(self) -> float:
        return 1.0 / (2 ** self.n_downsample)

    @property
    def downsample_factor(self) -> int:
        return 2 ** self.n_downsample

    @property
    def corr_planes(self) -> int:
        return self.corr_levels * (2 * self.corr_radius + 1)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """One training recipe (mirrors the flag sets of the three .sh scripts)."""

    name: str = "TC-Stereo"
    train_dataset: str = "sceneflow"  # {'sceneflow','TartanAir','kitti_raw'}
    lr: float = 2e-4
    num_steps: int = 200_000
    batch_size: int = 4  # per-process batch (reference: per-GPU batch 4)
    image_size: Tuple[int, int] = (320, 720)  # (H, W) random crop
    frame_length: int = 2  # temporal unroll (chunked BPTT window)
    # Temporal vs single-frame training (reference --temporal flag,
    # train_stereo.py:472; all three recipes pass it). temporal=False trains
    # single pairs (T=1, argmax-bootstrap path only): the 'kitti' GT config
    # and the single_frame modes of sceneflow/TartanAir/kitti_raw.
    temporal: bool = True
    train_iters: int = 5
    valid_iters: int = 5
    wdecay: float = 1e-5
    grad_clip: float = 1.0
    seed: int = 1234
    # Loss weights (reference ``train_stereo.py:364-398``)
    loss_gamma: float = 0.9
    normal_loss_weight: float = 0.25
    grad_loss_weight: float = 5.0
    init_k: int = 3
    # Augmentation (reference flags)
    saturation_range: Optional[Tuple[float, float]] = (0.0, 1.4)
    img_gamma: Optional[Tuple[float, float]] = None
    # 'h'/'hf'/'v' flips are single-pair-only (temporal augmentors reject
    # them — flips invalidate the carried camera poses; see data/augmentor.py)
    do_flip: Optional[str] = None
    spatial_scale: Tuple[float, float] = (-0.2, 0.4)
    # ±2px right-image row jitter at crop time (simulated imperfect
    # rectification, reference --noyjitter inverted; all recipes disable it)
    yjitter: bool = False
    # Rematerialize each frame's forward in the BPTT backward pass
    # (jax.checkpoint): trades FLOPs for activation memory on long windows.
    remat_frames: bool = True
    # Named activations (jax.ad_checkpoint.checkpoint_name tags inside the
    # model) to SAVE under frame remat instead of recomputing
    # (jax.checkpoint_policies.save_only_these_names). The default saves the
    # GRU-iteration scan boundaries — per-iteration carries ('iter_carry')
    # and the scan's loop-invariant inputs ('iter_consts', pyramid/context
    # gates/initial carry) — so the backward recomputes one iteration cell
    # at a time from saved tensors instead of replaying the whole unrolled
    # scan chain (whose one-big-graph recompute picks reformat-heavy
    # layouts): measured 1739.2 → 1670.6 ms/step (+4%) on the TartanAir
    # recipe for ~1.1 GB of bf16 activations. Also taggable:
    # 'enc_conv1'/'enc_layer1'/'enc_layer2'/'enc_layer3' (encoder stages —
    # measured NEUTRAL alone, and 1690 ms when stacked on the iter tags).
    # Empty = plain full-frame remat (lowest memory).
    # 'frame_mid' additionally saves the tiny completor / warp-path outputs
    # that gate the splat + pinhole-geometry recompute (<30 MB/frame):
    # 1670.6 → 1638.1 ms/step.
    # 'loss_gt' saves the GT-side loss tensors (median-pooled gradients /
    # normals, init-loss index/band masks) — pure data with no gradients,
    # so replaying their computation is waste: 1795.8 → 1777.8 ms/step at
    # the exact 480×640 recipe crop.
    remat_save_names: Tuple[str, ...] = ("iter_carry", "iter_consts",
                                         "frame_mid", "loss_gt")
    # Run the image->feature encoder OUTSIDE the temporal frame scan
    # (models.TCSFeatureEncoder; exact same parameters/math — conv stacks
    # are per-sample), in a dedicated chunk scan. Measured 1777.9 → 1677.6
    # ms/step on the TartanAir recipe (chunk=2): the hoisted encoder avoids
    # the frame scan's per-frame weight-gradient accumulation and the remat
    # replay's reformat-heavy layouts (PERF.md).
    encode_outside_scan: bool = True
    # Frames per hoisted-encoder call (encode_outside_scan): bounds the
    # backward-replay transient (one full-resolution trunk of B*nc images
    # alive at once). The full-window batch (nc = frame_length) overflowed
    # HBM by ~0.7 GB at the TartanAir recipe.
    encode_chunk_frames: int = 2
    # checkpoint_name tags to SAVE inside the hoisted encoder's remat
    # (instead of replaying the trunk in its backward): 'enc_conv1',
    # 'enc_inner', 'enc_layer1'..'enc_layer3'. Empty = plain checkpoint
    # (save only chunk outputs, replay the trunk once per chunk).
    encode_save_names: Tuple[str, ...] = ()
    # Checkpoint the hoisted encoder's chunk scan (backward replays the
    # trunk once per chunk instead of saving its intermediates). Off saves
    # the replay (~97 ms/step at the TartanAir recipe) at the cost of every
    # chunk's full-resolution trunk residuals staying live until the
    # post-scan pullback — measured effect in PERF.md round 5.
    encode_remat: bool = True
    # Hoist the convex-upsample mask head, full-resolution upsampling and the
    # four losses OUT of the frame scan: the scan emits q-resolution
    # per-iteration tensors only, and the head/upsample/losses run once,
    # batched over (frames*iterations*batch), with per-frame losses vmapped
    # so masked-mean denominators stay per-frame (reference semantics).
    # Measured 1777.9 → 1705.2 alone, 1598.9 combined with
    # encode_outside_scan (TartanAir recipe, device timeline).
    losses_outside_scan: bool = True
    # Unroll factor of the frame lax.scan (1 = rolled loop). Unrolling lets
    # XLA lay out each frame's remat recompute independently of the backward
    # scan body — measured effect documented in scripts/bench_train.py.
    frame_unroll: int = 1
    # lax.scan(_split_transpose=True) on the frame scan: XLA transposes the
    # scan into separate recompute and accumulate loops. Measured effect on
    # the backward's boundary copies documented in PERF.md round 4.
    frame_scan_split_transpose: bool = False
    # Two-phase frame-parallel backward. The temporal carries are
    # stop-gradient on BOTH sides (reference detaches them,
    # tc_stereo.py:221-242), so each frame's backward is independent of the
    # others: Phase A runs the sequential frame scan WITHOUT gradient
    # tracking purely to collect every frame's incoming TemporalState;
    # Phase B then recomputes all frames' differentiable forwards FOLDED
    # INTO THE BATCH AXIS (frame 0 = bootstrap group, frames 1.. = temporal
    # group) and differentiates that. Same FLOPs as remat (Phase A replaces
    # the backward's recompute, paid up front), but the backward becomes one
    # big-batch program — (T−1)·B-sample conv gradients instead of T
    # sequential B-sample accumulations — with no backward while loop, no
    # scan-boundary carry copies and no checkpoint replay machinery.
    # Numerically equivalent to the scan path up to fp reassociation
    # (equivalence-tested). Requires losses_outside_scan. Memory: all
    # frames' q-resolution activations are live for the backward (the
    # encoder stays hoisted/chunked); enable model.remat_iter_cell to bound
    # the iteration stack if HBM is tight.
    frame_parallel_backward: bool = False
    # Per-frame gradients accumulated INSIDE the forward frame scan. The
    # same frame-independence property as frame_parallel_backward, harvested
    # sequentially: the scan body computes value_and_grad of its own frame's
    # loss and carries a parameter-shaped gradient accumulator (~67 MB
    # fp32), so the frame scan is never transposed by XLA — no backward
    # while loop, no boundary carry copies, no saved-ys dynamic slicing —
    # and, unlike the remat path, each frame's forward runs exactly ONCE
    # (the primal that produces the carried temporal state IS the gradient
    # pass's forward; there is no replay). Memory: one frame's full
    # forward+backward residuals live at a time (no frame remat needed);
    # combine with model.remat_iter_cell if HBM is tight. Numerically
    # equal to the scan path up to fp reassociation (equivalence-tested).
    # DEFAULT since round 5 — measured on v5e-16G at the exact recipe crops:
    # TartanAir 1566.3 → 1371.4, SceneFlow 573.7 → 522.0, KITTI_raw 1757.1
    # → 1522.9 ms/step (PERF.md round 5). An explicitly-set
    # frame_parallel_backward takes precedence over this default.
    frame_inline_backward: bool = True
    # Remat the per-frame loss tail (mask head + convex upsample + losses)
    # inside the inline backward: the convex-upsample backward materialises
    # (it·B, h, 4, w, 4, ·) fp32 product temps (~0.9 GB/frame); the remat
    # replays the cheap elementwise tail instead of keeping them live
    # (GT-side tensors stay saved via the 'loss_gt' tags). Off trades that
    # memory for skipping the replay — measured effect in PERF.md round 5.
    inline_tail_remat: bool = True
    # Checkpointing / validation cadence
    validation_frequency: int = 10_000
    checkpoint_dir: str = "checkpoints"
    # Loader decode threads per process (reference uses 4 worker processes +
    # prefetch 4, stereo_datasets.py:727-733; here threads over the
    # GIL-releasing native decode core).
    num_workers: int = 4
    restore_ckpt: Optional[str] = None
    # Data roots
    data_root: str = "datasets"
    # Parallelism: number of data-parallel shards is derived from the mesh at
    # runtime; batch_size above is per-shard.
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)


def sceneflow_recipe() -> TrainConfig:
    """``sceneflow_ddp_train.sh``: 200k steps, b4, lr 2e-4, 320x720, fl 2."""
    return TrainConfig(
        name="sceneflow_benchmark",
        train_dataset="sceneflow",
        lr=2e-4,
        num_steps=200_000,
        batch_size=4,
        image_size=(320, 720),
        frame_length=2,
        saturation_range=(0.0, 1.4),
        spatial_scale=(-0.2, 0.4),
    )


def tartanair_recipe() -> TrainConfig:
    """``tartanair_ddp_train.sh``: 100k steps, b4, lr 2e-4, 480x640, fl 4."""
    return TrainConfig(
        name="ablation_tartanair",
        train_dataset="TartanAir",
        lr=2e-4,
        num_steps=100_000,
        batch_size=4,
        image_size=(480, 640),
        frame_length=4,
        saturation_range=(0.0, 1.4),
        spatial_scale=(-0.2, 0.4),
    )


def kitti_raw_recipe(restore: str = "checkpoints/tartanair") -> TrainConfig:
    """``KITTI_ddp_train.sh``: 60k steps, b4, lr 1e-4, 320x1024, fl 4."""
    return TrainConfig(
        name="KITTI_RAW",
        train_dataset="kitti_raw",
        lr=1e-4,
        num_steps=60_000,
        batch_size=4,
        image_size=(320, 1024),
        frame_length=4,
        saturation_range=(0.7, 1.3),
        spatial_scale=(-0.2, 0.2),
        restore_ckpt=restore,
    )


RECIPES = {
    "sceneflow": sceneflow_recipe,
    "TartanAir": tartanair_recipe,
    "kitti_raw": kitti_raw_recipe,
}
