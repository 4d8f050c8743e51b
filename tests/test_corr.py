"""Unit tests for tcs_tpu.ops.corr against torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from tcs_tpu.ops import corr


def test_cost_volume_cosine(rng):
    B, H, W, C = 1, 3, 5, 8
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = np.asarray(corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2)))
    assert cv.shape == (B, H, W, W)
    # Cosine similarity bounded
    assert cv.max() <= 1.0 + 1e-5 and cv.min() >= -1.0 - 1e-5
    # Spot check one entry
    a = f1[0, 1, 2] / np.linalg.norm(f1[0, 1, 2])
    b = f2[0, 1, 4] / np.linalg.norm(f2[0, 1, 4])
    np.testing.assert_allclose(cv[0, 1, 2, 4], a @ b, atol=1e-5)


def test_pyramid_pooling(rng):
    cv = rng.normal(size=(1, 2, 3, 16)).astype(np.float32)
    pyr = corr.corr_pyramid(jnp.asarray(cv), 4)
    assert len(pyr) == 4
    assert pyr[0].shape[-1] == 16 and pyr[3].shape[-1] == 2
    np.testing.assert_allclose(
        np.asarray(pyr[1])[0, 0, 0, 0], (cv[0, 0, 0, 0] + cv[0, 0, 0, 1]) / 2, atol=1e-6
    )
    # Level i equals torch avg_pool1d applied i times
    t = torch.from_numpy(cv).reshape(-1, 1, 16)
    for i in range(1, 4):
        t = F.avg_pool1d(t, 2, 2)
        np.testing.assert_allclose(
            np.asarray(pyr[i]).reshape(-1, 16 >> i), t.squeeze(1).numpy(), atol=1e-6
        )


def test_pyramid_pooling_odd_width(rng):
    """Odd W2 floor-pools like torch avg_pool1d (drops trailing element).

    This is the SceneFlow-recipe shape class: 320×720 crop → W2 = 180 → 90
    → 45 → 22 (reference corr.py:21-23 via F.avg_pool1d)."""
    for W2 in (45, 180, 13):
        cv = rng.normal(size=(1, 2, 3, W2)).astype(np.float32)
        for builder, tr in (
            (lambda x: corr.corr_pyramid(jnp.asarray(x), 4), lambda a: a),
            (
                lambda x: corr.corr_pyramid_w2major(
                    jnp.asarray(x.transpose(0, 1, 3, 2)), 4
                ),
                lambda a: a.transpose(0, 1, 3, 2),
            ),
        ):
            pyr = builder(cv)
            t = torch.from_numpy(cv).reshape(-1, 1, W2)
            for i in range(1, 4):
                t = F.avg_pool1d(t, 2, 2)
                got = tr(np.asarray(pyr[i])).reshape(-1, pyr[i].size // 6)
                np.testing.assert_allclose(got, t.squeeze(1).numpy(), atol=1e-6)


def test_lookup_odd_width_matches_oracle(rng):
    """Full build→pyramid→lookup chain at an odd-ish width (W=45) matches the
    per-element gather oracle for every lookup backend."""
    B, H, W, C, levels, r = 1, 2, 45, 8, 4, 4
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2))
    cv_T = corr.build_cost_volume_w2major(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr.corr_pyramid(cv, levels)
    pyr_T = corr.corr_pyramid_w2major(cv_T, levels)
    assert tuple(p.shape[-1] for p in pyr) == (45, 22, 11, 5)
    assert tuple(p.shape[-2] for p in pyr_T) == (45, 22, 11, 5)
    coords = rng.uniform(-4, W + 4, size=(B, H, W)).astype(np.float32)
    ref = np.asarray(corr.lookup_gather(pyr, jnp.asarray(coords), r))
    for impl in (corr.lookup_onehot, corr.lookup_window, corr.lookup_roll):
        np.testing.assert_allclose(
            np.asarray(impl(pyr, jnp.asarray(coords), r)), ref, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(corr.lookup_onehot_w2major(pyr_T, jnp.asarray(coords), r)),
        ref, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(corr.lookup_onehot_w2major_vjp(pyr_T, jnp.asarray(coords), r)),
        ref, atol=1e-5,
    )


def test_masked_cost_volume(rng):
    cv = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)
    m = np.asarray(corr.masked_cost_volume(jnp.asarray(cv)))
    for w1 in range(4):
        for w2 in range(4):
            if w2 > w1:
                assert (m[:, :, w1, w2] == 0).all()
            else:
                np.testing.assert_allclose(m[:, :, w1, w2], cv[:, :, w1, w2])


def test_lookup_matches_grid_sample_oracle(rng):
    """Oracle reimplements CorrBlock1D.__call__ (corr.py:33-52) in torch."""
    B, H, W, C, levels, r = 1, 4, 16, 8, 3, 4
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr.corr_pyramid(cv, levels)
    coords = rng.uniform(-2, W + 2, size=(B, H, W)).astype(np.float32)

    ours = np.asarray(corr.lookup(pyr, jnp.asarray(coords), r))

    # torch oracle
    tc = torch.from_numpy(np.asarray(cv)).reshape(B * H * W, 1, 1, W)
    out_pyr = []
    cur = tc
    for i in range(levels):
        W2 = cur.shape[-1]
        dx = torch.linspace(-r, r, 2 * r + 1).view(2 * r + 1, 1)
        x0 = dx + torch.from_numpy(coords).reshape(B * H * W, 1, 1, 1) / 2 ** i
        y0 = torch.zeros_like(x0)
        grid = torch.cat([x0, y0], dim=-1)
        xg = 2 * grid[..., 0:1] / (W2 - 1) - 1
        yg = grid[..., 1:2]
        g = torch.cat([xg, yg], dim=-1)
        samp = F.grid_sample(cur, g, align_corners=True, padding_mode="zeros")
        out_pyr.append(samp.view(B, H, W, -1))
        cur = F.avg_pool2d(cur, [1, 2], stride=[1, 2])
    ref = torch.cat(out_pyr, dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_argmax_disp():
    # Hand-built masked cost volume, B=1, H=1, W=4
    cv = np.zeros((1, 1, 4, 4), np.float32)
    # Pixel w1=3: strong peak at w2=1 (disp 2), weak elsewhere → kept.
    cv[0, 0, 3, 1] = 0.9
    cv[0, 0, 3, 3] = 0.2
    # Pixel w1=2: two close peaks beyond suppression band → rejected.
    cv[0, 0, 2, 0] = 0.8
    cv[0, 0, 2, 2] = 0.75
    disp, cost, mask = corr.argmax_disp(jnp.asarray(cv), margin=0.3)
    disp, cost, mask = np.asarray(disp), np.asarray(cost), np.asarray(mask)
    assert mask[0, 0, 3, 0] == 1.0
    assert disp[0, 0, 3, 0] == 2.0
    np.testing.assert_allclose(cost[0, 0, 3, 0], 0.9)
    assert mask[0, 0, 2, 0] == 0.0
    assert disp[0, 0, 2, 0] == 0.0


def test_argmax_disp_suppression_band():
    # Runner-up adjacent to the peak is inside the ±1.5 band → ignored.
    cv = np.zeros((1, 1, 1, 8), np.float32)
    cv[0, 0, 0, 0] = 0.9
    cv[0, 0, 0, 1] = 0.85  # within band of index 0
    disp, cost, mask = corr.argmax_disp(jnp.asarray(cv), margin=0.3)
    assert np.asarray(mask)[0, 0, 0, 0] == 1.0


def test_lookup_fast_matches_gather_oracle(rng):
    """Windowed one-hot lookup ≡ per-element gather lookup, incl. edges."""
    B, H, W, C, levels, r = 2, 3, 32, 8, 4, 4
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr.corr_pyramid(cv, levels)
    # coordinates spanning out-of-range, edges and interior
    coords = rng.uniform(-6, W + 6, size=(B, H, W)).astype(np.float32)
    ref = np.asarray(corr.lookup_gather(pyr, jnp.asarray(coords), r))
    for impl in (corr.lookup_onehot, corr.lookup_window, corr.lookup_roll,
                 corr.lookup):
        fast = np.asarray(impl(pyr, jnp.asarray(coords), r))
        np.testing.assert_allclose(fast, ref, atol=1e-5)

    # exactly-integer coordinates (alpha == 0 boundary cases)
    coords_i = np.round(coords).astype(np.float32)
    ref = np.asarray(corr.lookup_gather(pyr, jnp.asarray(coords_i), r))
    for impl in (corr.lookup_onehot, corr.lookup_window, corr.lookup_roll,
                 corr.lookup):
        fast = np.asarray(impl(pyr, jnp.asarray(coords_i), r))
        np.testing.assert_allclose(fast, ref, atol=1e-5)


def test_lookup_w2major_matches_gather_oracle(rng):
    """W2-major (sublane-reduction) lookup ≡ gather oracle, incl. edges."""
    B, H, W, C, levels, r = 2, 3, 32, 8, 4, 4
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f2 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    cv = corr.build_cost_volume(jnp.asarray(f1), jnp.asarray(f2))
    cv_T = corr.build_cost_volume_w2major(jnp.asarray(f1), jnp.asarray(f2))
    np.testing.assert_allclose(np.asarray(cv_T),
                               np.asarray(cv).transpose(0, 1, 3, 2),
                               atol=1e-6)
    pyr = corr.corr_pyramid(cv, levels)
    pyr_T = corr.corr_pyramid_w2major(cv_T, levels)
    for a, b in zip(pyr, pyr_T):
        np.testing.assert_allclose(np.asarray(b),
                                   np.asarray(a).transpose(0, 1, 3, 2),
                                   atol=1e-6)
    for coords in (
        rng.uniform(-6, W + 6, size=(B, H, W)).astype(np.float32),
        np.round(rng.uniform(-2, W + 2, size=(B, H, W))).astype(np.float32),
    ):
        ref = np.asarray(corr.lookup_gather(pyr, jnp.asarray(coords), r))
        out = np.asarray(
            corr.lookup_onehot_w2major(pyr_T, jnp.asarray(coords), r)
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_lookup_w2major_custom_vjp(rng):
    """The hand-written linear VJP backend reproduces the autodiff lookup
    exactly — forward values AND pyramid gradients (coordinate gradients are
    defined as zero: the model always stop-gradients the lookup coords,
    reference tc_stereo.py:176)."""
    B, H, W1, W2, levels, r = 1, 4, 16, 16, 3, 4
    pyr = tuple(
        jnp.asarray(rng.normal(size=(B, H, W2 >> i, W1)).astype(np.float32))
        for i in range(levels)
    )
    coords = jnp.asarray(
        rng.uniform(-3, W2 + 3, size=(B, H, W1)).astype(np.float32)
    )

    out_ref = corr.lookup_onehot_w2major(pyr, coords, r)
    out_vjp = corr.lookup_onehot_w2major_vjp(pyr, coords, r)
    np.testing.assert_array_equal(np.asarray(out_vjp), np.asarray(out_ref))

    def loss(fn):
        return lambda p: jnp.sum(jnp.sin(fn(p, coords, r)))

    g_ref = jax.grad(loss(corr.lookup_onehot_w2major))(pyr)
    g_vjp = jax.grad(loss(corr.lookup_onehot_w2major_vjp))(pyr)
    for a, b in zip(g_ref, g_vjp):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
