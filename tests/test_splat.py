"""Unit tests for forward softmax splatting (tcs_tpu.ops.splat)."""

import numpy as np
import jax
import jax.numpy as jnp

from tcs_tpu.ops import splat


def numpy_splat_sum(values, flow):
    """Loop oracle of the reference CUDA kernel (softsplat.py:284-345)."""
    B, H, W, C = values.shape
    out = np.zeros_like(values)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                fx = x + flow[b, y, x, 0]
                fy = y + flow[b, y, x, 1]
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                for dx in (0, 1):
                    for dy in (0, 1):
                        xi, yi = x0 + dx, y0 + dy
                        if not (0 <= xi < W and 0 <= yi < H):
                            continue
                        w = (1 - abs(fx - xi)) * (1 - abs(fy - yi))
                        out[b, yi, xi] += values[b, y, x] * w
    return out


def test_zero_flow_is_identity(rng):
    v = rng.normal(size=(1, 4, 5, 3)).astype(np.float32)
    out = splat.splat_sum(jnp.asarray(v), jnp.zeros((1, 4, 5, 2), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-6)


def test_integer_flow_shifts(rng):
    v = np.zeros((1, 4, 6, 1), np.float32)
    v[0, 1, 2, 0] = 3.0
    flow = np.zeros((1, 4, 6, 2), np.float32)
    flow[0, 1, 2] = [2.0, 1.0]  # move to (x=4, y=2)
    out = np.asarray(splat.splat_sum(jnp.asarray(v), jnp.asarray(flow)))
    assert out[0, 2, 4, 0] == 3.0
    assert out.sum() == 3.0


def test_splat_sum_matches_oracle(rng):
    B, H, W, C = 2, 6, 7, 3
    v = rng.normal(size=(B, H, W, C)).astype(np.float32)
    flow = rng.uniform(-3, 3, size=(B, H, W, 2)).astype(np.float32)
    out = np.asarray(splat.splat_sum(jnp.asarray(v), jnp.asarray(flow)))
    ref = numpy_splat_sum(v, flow)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_nonfinite_flow_skipped(rng):
    v = np.ones((1, 3, 3, 1), np.float32)
    flow = np.zeros((1, 3, 3, 2), np.float32)
    flow[0, 1, 1, 0] = np.nan
    flow[0, 0, 0, 1] = np.inf
    out = np.asarray(splat.splat_sum(jnp.asarray(v), jnp.asarray(flow)))
    assert np.isfinite(out).all()
    assert out.sum() == 7.0  # two of nine pixels dropped


def test_softsplat_soft_clipeps_mass(rng):
    """With zero flow, soft mode must reproduce the input where valid."""
    B, H, W, C = 1, 4, 4, 2
    v = rng.normal(size=(B, H, W, C)).astype(np.float32)
    metric = rng.normal(size=(B, H, W, 1)).astype(np.float32)
    valid = np.ones((B, H, W, 1), np.float32)
    valid[0, 0, 0, 0] = 0.0
    out, mask = splat.softsplat(
        jnp.asarray(v), jnp.zeros((B, H, W, 2), jnp.float32),
        jnp.asarray(metric), "soft-clipeps", jnp.asarray(valid)
    )
    out, mask = np.asarray(out), np.asarray(mask)
    np.testing.assert_allclose(out[0, 1:], v[0, 1:], atol=1e-5)
    assert mask[0, 0, 0, 0] == 0.0
    np.testing.assert_allclose(out[0, 0, 0], 0.0, atol=1e-6)
    assert mask[0, 1:].min() == 1.0


def test_softsplat_soft_mixes_by_exp_metric():
    """Two sources landing on one target mix with softmax weights."""
    v = np.zeros((1, 1, 4, 1), np.float32)
    v[0, 0, 0, 0] = 1.0
    v[0, 0, 1, 0] = 3.0
    flow = np.zeros((1, 1, 4, 2), np.float32)
    flow[0, 0, 0, 0] = 2.0  # 0 -> 2
    flow[0, 0, 1, 0] = 1.0  # 1 -> 2
    metric = np.zeros((1, 1, 4, 1), np.float32)
    metric[0, 0, 0, 0] = 1.0
    metric[0, 0, 1, 0] = 0.0
    out, mask = splat.softsplat(
        jnp.asarray(v), jnp.asarray(flow), jnp.asarray(metric), "soft-clipeps"
    )
    e = np.exp(1.0)
    # Three sources land on x=2: x=0 (w=e, val=1), x=1 (w=1, val=3) and x=2
    # itself (zero flow, w=exp(0)=1, val=0).
    expected = (1.0 * e + 3.0 * 1.0 + 0.0) / (e + 1.0 + 1.0)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 2, 0], expected, rtol=1e-5)


def test_splat_grads(rng):
    """Finite-difference check of both value and flow gradients.

    Flow values are kept away from integers so the floor() boundaries do not
    break the finite-difference comparison.
    """
    from jax.test_util import check_grads

    B, H, W, C = 1, 4, 4, 2
    v = rng.normal(size=(B, H, W, C)).astype(np.float32)
    flow = (rng.uniform(-1, 1, size=(B, H, W, 2)) * 0.8 + 0.35).astype(np.float32)

    def f(v_, flow_):
        return splat.splat_sum(v_, flow_).sum()

    check_grads(f, (jnp.asarray(v), jnp.asarray(flow)), order=1, modes=["rev"],
                atol=1e-2, rtol=1e-2)


def test_linear_and_avg_modes(rng):
    v = rng.normal(size=(1, 3, 3, 1)).astype(np.float32)
    metric = rng.uniform(0.5, 2.0, size=(1, 3, 3, 1)).astype(np.float32)
    zero_flow = jnp.zeros((1, 3, 3, 2), jnp.float32)
    out_lin, _ = splat.softsplat(jnp.asarray(v), zero_flow, jnp.asarray(metric), "linear-addeps")
    np.testing.assert_allclose(np.asarray(out_lin), v, atol=1e-4)
    out_avg, _ = splat.softsplat(jnp.asarray(v), zero_flow, None, "avg")
    np.testing.assert_allclose(np.asarray(out_avg), v, atol=1e-4)
    out_sum, _ = splat.softsplat(jnp.asarray(v), zero_flow, None, "sum")
    np.testing.assert_allclose(np.asarray(out_sum), v, atol=1e-6)


def test_splat_sum_fused_matches_per_tap(rng):
    """The single-scatter (xla_fused) backend must match the 4-scatter one
    (same cells, fp addition order within a cell may differ → allclose)."""
    from tcs_tpu.ops.splat import splat_sum, splat_sum_fused

    B, H, W, C = 2, 9, 11, 5
    values = rng.normal(size=(B, H, W, C)).astype(np.float32)
    flow = (3.0 * rng.normal(size=(B, H, W, 2))).astype(np.float32)
    flow[0, 1, 1] = np.nan  # non-finite targets must be dropped
    a = np.asarray(splat_sum(jnp.asarray(values), jnp.asarray(flow)))
    b = np.asarray(splat_sum_fused(jnp.asarray(values), jnp.asarray(flow)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_gatherbwd_forward_and_grads_match_autodiff(rng):
    """The hand-written gather VJP (splat_sum_gatherbwd) must produce the
    SAME forward values and the same value/flow gradients as JAX autodiff
    of the scatter formulation — including boundary taps (flow pushing
    mass off the image) and non-finite targets."""
    B, H, W, C = 2, 6, 8, 3
    v = rng.normal(size=(B, H, W, C)).astype(np.float32)
    flow = (rng.uniform(-2.5, 2.5, size=(B, H, W, 2)) + 0.3).astype(np.float32)
    flow[0, 0, 0] = np.nan  # non-finite target is skipped, grads zero
    v_j, f_j = jnp.asarray(v), jnp.asarray(flow)

    out_ref = splat.splat_sum(v_j, f_j)
    out_new = splat.splat_sum_gatherbwd(v_j, f_j)
    np.testing.assert_array_equal(np.asarray(out_ref), np.asarray(out_new))

    cot = jnp.asarray(rng.normal(size=out_ref.shape).astype(np.float32))

    def loss_ref(v_, f_):
        return (splat.splat_sum(v_, f_) * cot).sum()

    def loss_new(v_, f_):
        return (splat.splat_sum_gatherbwd(v_, f_) * cot).sum()

    gv_ref, gf_ref = jax.grad(loss_ref, argnums=(0, 1))(v_j, f_j)
    gv_new, gf_new = jax.grad(loss_new, argnums=(0, 1))(v_j, f_j)
    np.testing.assert_allclose(np.asarray(gv_ref), np.asarray(gv_new),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_ref), np.asarray(gf_new),
                               atol=1e-4, rtol=1e-4)
    assert np.isfinite(np.asarray(gf_new)).all()
    assert np.asarray(gf_new)[0, 0, 0].tolist() == [0.0, 0.0]
