"""Basic Flax building blocks (NHWC, bf16-compute / fp32-param policy).

Equivalents of the reference's ``core/extractor.py:5`` (``ResidualBlock``) and
``core/utils/basic_layers.py`` (``BasicConv_IN``, ``Conv2x_IN``), plus
torch-compatible initialisers and norm layers so a converted reference
checkpoint reproduces the same function.

Conventions:
- all convs are NHWC / HWIO (TPU-native);
- ``param_dtype`` is always fp32; ``dtype`` is the compute dtype (bf16 under
  the mixed-precision policy, mirroring the reference's autocast regions);
- normalisation statistics are always computed in fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Initialisers
# ---------------------------------------------------------------------------

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) → Var = 1/(3·fan_in).
torch_default_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
# Reference's explicit init for encoders/update block: kaiming_normal(relu).
kaiming_normal_fan_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_bias_init(fan_in: int):
    """torch Conv2d default bias: U(−1/√fan_in, 1/√fan_in)."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# ---------------------------------------------------------------------------
# Normalisation
# ---------------------------------------------------------------------------


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch ``InstanceNorm2d`` defaults: per-(sample, channel) spatial stats,
    no affine, biased variance."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class GroupNorm(nn.Module):
    """torch GroupNorm (affine, eps 1e-5) on NHWC."""

    num_groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class BatchNorm(nn.Module):
    """Per-batch-statistics normalisation with affine parameters.

    The reference never enables BatchNorm in its recipes (context_norm is
    'none'; the only BN mentions are the commented-out freeze path,
    ``train_stereo.py:315-319``). We provide train-mode BN (statistics from
    the current batch, no running averages) for config parity. Under the DP
    mesh the ``jnp.mean`` over the sharded batch axis is the GLOBAL batch
    mean (XLA inserts the all-reduce), so this is SyncBatchNorm semantics
    by construction — the reference's ``--sync_bn`` wrap has no analogue to
    add (tested: test_train::test_batchnorm_is_sync_bn_under_mesh).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 1, 2), keepdims=True)
        var = xf.var(axis=(0, 1, 2), keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return out.astype(x.dtype)


class Norm(nn.Module):
    """Dispatch over the reference's norm_fn ∈ {group,batch,instance,none}."""

    norm_fn: str
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.norm_fn == "none":
            return x
        if self.norm_fn == "instance":
            return instance_norm(x)
        if self.norm_fn == "group":
            return GroupNorm(num_groups=self.features // 8, dtype=self.dtype)(x)
        if self.norm_fn == "batch":
            return BatchNorm(dtype=self.dtype)(x)
        raise ValueError(f"unknown norm_fn: {self.norm_fn}")


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


class Conv(nn.Module):
    """2D conv with torch-style integer padding and torch-default init.

    ``dual=2`` applies the SAME logical (k, k, Ci, Co) weights independently
    to two images packed along the channel axis (input 2·Ci → output 2·Co)
    by expanding the kernel block-diagonally at apply time. Numerics are
    exactly the per-image convolution (the cross blocks are zeros), and the
    parameter tree / checkpoints are unchanged. Motivation: the encoder trunk
    has 64-channel full-resolution stages where a (2B, H, W, 64) batch wastes
    half of the TPU's 128 lanes and pushes XLA into a space-to-batch form
    with ~2.4 ms of halo/select/copy overhead per conv; the packed
    (B, H, W, 128) form measured 1.6× faster end-to-end on v5e.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None  # default: 'same'-style (kernel // 2)
    use_bias: bool = True
    kernel_init: Callable = torch_default_kernel_init
    torch_bias: bool = True
    dtype: Any = jnp.float32
    dual: int = 1
    # Round the input-channel count up to a multiple of this by zero-padding
    # the input AND the kernel's input rows at apply time (params / checkpoint
    # layout unchanged, numerics exact — the padded rows multiply zeros).
    # Motivation: the motion encoder's 36-channel corr-lookup conv backward
    # lowers to VPU loop fusions + relayout copies on the unaligned minor dim
    # (~48 ms/step of the TartanAir train step); born-aligned inputs keep the
    # conv and its transpose on the MXU.
    in_pad: int = 1
    # Space-to-depth factor (stride-1, 'same'-padding convs only). The
    # logical (k, k, Ci, Co) weights are rearranged at apply time into an
    # equivalent block conv on the (H/s, W/s, s²·Ci) space-to-depth layout —
    # same parameters, same math (fp reduction order differs, as it already
    # does between any two conv emitters). Motivation: a 7×7 conv on a
    # 3/6-channel image uses 6 of the MXU's 128 contraction lanes (~2%
    # utilisation, ~20 ms/step at recipe shapes in training, recomputed by
    # the remat backward); with s=4 the contraction dim becomes s²·Ci = 96
    # and the conv runs ~10× faster end-to-end despite 3× the nominal MACs.
    s2d: int = 1

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2 if self.padding is None else self.padding
        ci = x.shape[-1] // self.dual
        fan_in = ci * self.kernel * self.kernel
        bias_init = (
            torch_bias_init(fan_in) if self.torch_bias else nn.initializers.zeros
        )
        m = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="Conv_0",
        )
        if self.s2d > 1:
            # ValueError (not assert) so unsupported configs fail with an
            # actionable message even under `python -O`.
            if self.dual != 1:
                raise ValueError(
                    f"Conv: s2d={self.s2d} does not compose with dual="
                    f"{self.dual} channel packing; use one or the other")
            if self.stride != 1 or pad != self.kernel // 2:
                raise ValueError(
                    f"Conv: s2d={self.s2d} supports stride-1 'same' convs "
                    f"only (got stride={self.stride}, padding={pad}, "
                    f"kernel={self.kernel})")
            if self.in_pad > 1:
                # The s2d path returns here and would silently ignore
                # in_pad; reject the combination explicitly (mirrors the
                # dual/s2d conflict above).
                raise ValueError(
                    f"Conv: s2d={self.s2d} does not compose with "
                    f"in_pad={self.in_pad}; use one or the other")
            return self._apply_s2d(m, x, ci)
        if self.in_pad > 1 and ci % self.in_pad:
            if self.dual != 1:
                raise ValueError(
                    f"Conv: in_pad={self.in_pad} does not compose with "
                    f"dual={self.dual} channel packing")
            cp = (-ci) % self.in_pad
            _ = m(jnp.zeros((1, 1, 1, ci), x.dtype))
            kernel = m.variables["params"]["kernel"]  # (k, k, ci, co)
            kpad = jnp.pad(kernel, ((0, 0), (0, 0), (0, cp), (0, 0)))
            xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp)))
            y = jax.lax.conv_general_dilated(
                xpad.astype(self.dtype), kpad.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.use_bias:
                y = y + m.variables["params"]["bias"].astype(self.dtype)
            return y
        if self.dual == 1:
            return m(x)
        # Create/read the child's params through a zero-cost dummy call (XLA
        # dead-code-eliminates it), then apply the block-diagonal expansion.
        _ = m(jnp.zeros((1, 1, 1, ci), x.dtype))
        kernel = m.variables["params"]["kernel"]  # (k, k, ci, co)
        co = self.features
        kbd = jnp.zeros((self.kernel, self.kernel, self.dual * ci,
                         self.dual * co), jnp.float32)
        for g in range(self.dual):
            kbd = kbd.at[:, :, g * ci:(g + 1) * ci,
                         g * co:(g + 1) * co].set(kernel)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kbd.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = m.variables["params"]["bias"]
            y = y + jnp.tile(bias, self.dual).astype(self.dtype)
        return y

    def _apply_s2d(self, m, x, ci):
        """Stride-1 'same' conv on the space-to-depth layout (see ``s2d``).

        Output pixel (s·i+a, s·j+b) of the logical conv reads input pixels
        m = s·i+a+di−pad; in block coordinates that is block i+⌊(a+di−pad)/s⌋,
        phase (a+di−pad) mod s — so the logical (k,k,Ci,Co) kernel rearranges
        exactly into an (ext,ext, s²Ci, s²Co) block kernel (unused slots are
        zero, and zero-padding whole blocks reproduces the logical zero
        padding because the out-of-range slots have zero weight).
        """
        s, k = self.s2d, self.kernel
        pad = k // 2
        co = self.features
        # Create/read params via the dummy call (as in the dual path).
        _ = m(jnp.zeros((1, 1, 1, ci), x.dtype))
        kernel = m.variables["params"]["kernel"].astype(jnp.float32)

        omin = -((pad + s - 1) // s)
        omax = (s - 1 + k - 1 - pad) // s
        ext = omax - omin + 1
        canvas_hw = ext * s

        phases = []
        for a in range(s):
            off_a = a - pad - omin * s
            for b in range(s):
                off_b = b - pad - omin * s
                canvas = jnp.pad(
                    kernel,
                    ((off_a, canvas_hw - k - off_a),
                     (off_b, canvas_hw - k - off_b), (0, 0), (0, 0)),
                )
                blk = canvas.reshape(ext, s, ext, s, ci, co)
                blk = blk.transpose(0, 2, 1, 3, 4, 5)  # (o, q, p, r, ci, co)
                phases.append(blk.reshape(ext, ext, s * s * ci, co))
        # Output channel packing (a, b, co) → (a·s+b)·co + c, matching the
        # depth-to-space unpack below.
        kbd = jnp.stack(phases, axis=-2).reshape(ext, ext, s * s * ci,
                                                 s * s * co)

        B, H, W, _ = x.shape
        if H % s != 0 or W % s != 0:
            raise ValueError(
                f"Conv: s2d={s} needs H and W divisible by {s}, got "
                f"{H}x{W}. Pad the input (e.g. InputPadder with divis_by a "
                f"multiple of 4*{s}) or disable conv1_s2d for this shape.")
        Hs, Ws = H // s, W // s
        xs = x.reshape(B, Hs, s, Ws, s, ci).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(B, Hs, Ws, s * s * ci)

        y = jax.lax.conv_general_dilated(
            xs.astype(self.dtype), kbd.astype(self.dtype),
            window_strides=(1, 1),
            padding=((-omin, omax), (-omin, omax)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y.reshape(B, Hs, Ws, s, s, co).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, H, W, co)
        if self.use_bias:
            y = y + m.variables["params"]["bias"].astype(self.dtype)
        return y


class ConvTranspose(nn.Module):
    """torch ``ConvTranspose2d(k=4, s=2, p=1)`` equivalent (2× upsample)."""

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k, s, p) ≡ flax ConvTranspose with
        # transpose_kernel=True and per-side padding (k−1−p); verified
        # numerically against torch (see tests/test_layers.py).
        lp = self.kernel - 1 - self.padding
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((lp, lp), (lp, lp)),
            use_bias=self.use_bias,
            transpose_kernel=True,
            kernel_init=torch_default_kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def leaky_relu(x, negative_slope: float = 0.01):
    return nn.leaky_relu(x, negative_slope=negative_slope)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


class ResidualBlock(nn.Module):
    """Two 3×3 convs + norm + residual (reference ``core/extractor.py:5``).

    ``dual=2`` processes two channel-packed images (see :class:`Conv`);
    'none' and 'instance' norms are exact per-image under packing (instance
    statistics are per-channel), the parameterised norms are not.
    """

    planes: int
    norm_fn: str = "group"
    stride: int = 1
    kernel_init: Callable = kaiming_normal_fan_out
    dtype: Any = jnp.float32
    dual: int = 1
    # checkpoint_name tag applied to the intra-block activations (the
    # conv2 input and the block output). Under frame remat with a
    # save_only_these_names policy this removes the block's convs from the
    # backward's recompute entirely — their weight gradients then read saved
    # activations. No-op without a matching policy tag.
    save_tag: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.dual > 1:
            assert self.norm_fn in ("none", "instance"), (
                f"packed-dual ResidualBlock needs a per-channel norm, got "
                f"{self.norm_fn}")
        in_planes = x.shape[-1] // self.dual
        y = Conv(self.planes, 3, self.stride, 1, kernel_init=self.kernel_init,
                 dtype=self.dtype, dual=self.dual, name="conv1")(x)
        y = Norm(self.norm_fn, self.planes, dtype=self.dtype, name="norm1")(y)
        y = nn.relu(y)
        if self.save_tag:
            from jax.ad_checkpoint import checkpoint_name
            y = checkpoint_name(y, self.save_tag)
        y = Conv(self.planes, 3, 1, 1, kernel_init=self.kernel_init,
                 dtype=self.dtype, dual=self.dual, name="conv2")(y)
        y = Norm(self.norm_fn, self.planes, dtype=self.dtype, name="norm2")(y)
        y = nn.relu(y)

        if not (self.stride == 1 and in_planes == self.planes):
            x = Conv(self.planes, 1, self.stride, 0, kernel_init=self.kernel_init,
                     dtype=self.dtype, dual=self.dual, name="downsample")(x)
            x = Norm(self.norm_fn, self.planes, dtype=self.dtype, name="norm3")(x)
        out = nn.relu(x + y)
        if self.save_tag:
            from jax.ad_checkpoint import checkpoint_name
            out = checkpoint_name(out, self.save_tag)
        return out


class BasicConvIN(nn.Module):
    """Conv (or deconv) + optional InstanceNorm + LeakyReLU
    (reference ``core/utils/basic_layers.py:9``)."""

    features: int
    deconv: bool = False
    use_in: bool = True
    relu: bool = True
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.deconv:
            x = ConvTranspose(self.features, self.kernel, self.stride,
                              self.padding, use_bias=False, dtype=self.dtype,
                              name="conv")(x)
        else:
            x = Conv(self.features, self.kernel, self.stride, self.padding,
                     use_bias=False, dtype=self.dtype, name="conv")(x)
        if self.use_in:
            x = instance_norm(x)
        if self.relu:
            x = leaky_relu(x)
        return x


class Conv2xIN(nn.Module):
    """Deconv-upsample, merge with skip, conv (reference ``basic_layers.py:38``,
    IGEV-style). Only the configuration the model uses is kept:
    deconv=True, concat=False (additive skip)."""

    features: int
    use_in: bool = True  # IN on the second conv (first conv always has IN)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rem):
        x = BasicConvIN(self.features, deconv=True, use_in=True, relu=True,
                        kernel=4, stride=2, padding=1, dtype=self.dtype,
                        name="conv1")(x)
        if x.shape[1:3] != rem.shape[1:3]:
            from tcs_tpu.ops.sampler import resize_nearest

            x = resize_nearest(x, rem.shape[1:3])
        x = x + rem
        x = BasicConvIN(self.features, deconv=False, use_in=self.use_in,
                        relu=True, kernel=3, stride=1, padding=1,
                        dtype=self.dtype, name="conv2")(x)
        return x


class ConvSeq(nn.Module):
    """conv → relu → conv ladder used by many heads (torch ``nn.Sequential``).

    specs: sequence of (features, kernel, stride, padding). ReLU between convs
    but, by default, not after the last one (set ``final_relu`` for the
    encoder-style blocks that end in ReLU).
    """

    specs: Sequence[Tuple[int, int, int, int]]
    final_relu: bool = False
    dtype: Any = jnp.float32
    kernel_init: Callable = torch_default_kernel_init

    @nn.compact
    def __call__(self, x):
        n = len(self.specs)
        for i, (f, k, s, p) in enumerate(self.specs):
            x = Conv(f, k, s, p, kernel_init=self.kernel_init,
                     dtype=self.dtype, name=f"conv{i}")(x)
            if i < n - 1 or self.final_relu:
                x = nn.relu(x)
        return x
