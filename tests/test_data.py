"""Data layer tests: readers, pose parsers, augmentor, dataset indexing,
loader — all on synthetic fixtures."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from tcs_tpu.data import frame_utils
from tcs_tpu.data.augmentor import (
    ColorJitter,
    TemporalFlowAugmentor,
    TemporalSparseFlowAugmentor,
    adjust_hue,
)
from tcs_tpu.data.datasets import TartanAir, tartanair_test_keywords
from tcs_tpu.data.loader import SequenceLoader

H, W = 120, 160


# ---------------------------------------------------------------------------
# frame_utils
# ---------------------------------------------------------------------------


def test_pfm_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(7, 9)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    frame_utils.writePFM(p, arr)
    back = frame_utils.readPFM(p)
    np.testing.assert_allclose(back, arr, atol=1e-6)


def test_kitti_disp_roundtrip(tmp_path, rng):
    disp = (rng.uniform(0, 100, size=(5, 6)) * 256).astype(np.uint16) / 256.0
    p = str(tmp_path / "d.png")
    frame_utils.writeDispKITTI(p, disp)
    back, valid = frame_utils.readDispKITTI(p)
    np.testing.assert_allclose(back, disp, atol=1 / 256.0)
    assert valid.dtype == bool


def test_tartanair_disp(tmp_path):
    depth = np.full((4, 5), 8.0, np.float32)
    p = str(tmp_path / "d.npy")
    np.save(p, depth)
    disp, valid = frame_utils.readDispTartanAir(p)
    np.testing.assert_allclose(disp, 80.0 / (8.0 + 1e-5), rtol=1e-5)
    assert valid.all()


def test_tartanair_pose_identity(tmp_path):
    # zero translation + identity quaternion → NED axis correction only
    p = str(tmp_path / "pose_left.txt")
    with open(p, "w") as f:
        f.write("0 0 0 0 0 0 1\n")
    T = frame_utils.read_tartanair_extrinsic(p)[0]
    expected = np.array([[0, 1, 0, 0], [0, 0, 1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], float)
    np.testing.assert_allclose(T, expected, atol=1e-12)


def test_tartanair_pose_matches_scipy(tmp_path):
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3)
    p = str(tmp_path / "pose_left.txt")
    with open(p, "w") as f:
        f.write(" ".join(str(v) for v in [*t, *q]) + "\n")
    T = frame_utils.read_tartanair_extrinsic(p)[0]
    R = Rotation.from_quat(q).as_matrix()
    ref = np.eye(4)
    ref[:3, :3] = R.T
    ref[:3, 3] = -R.T @ t
    m = np.zeros((4, 4))
    m[0, 1] = m[1, 2] = m[2, 0] = m[3, 3] = 1
    np.testing.assert_allclose(T, m @ ref, atol=1e-10)


def test_sceneflow_pose(tmp_path):
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    p = str(tmp_path / "camera_data.txt")
    with open(p, "w") as f:
        f.write("Frame 0\n")
        f.write("L " + " ".join(str(v) for v in T.flatten()) + "\n")
        f.write("R " + " ".join(str(v) for v in T.flatten()) + "\n")
    poses = frame_utils.readsceneflow_pose(p)
    assert len(poses) == 1
    np.testing.assert_allclose(poses[0], np.linalg.inv(T), atol=1e-10)


def test_kitti_pose_and_calib(tmp_path):
    T = np.eye(4)
    T[:3, 3] = [0.5, 0, 0]
    p = str(tmp_path / "pose.txt")
    with open(p, "w") as f:
        f.write(" ".join(str(v) for v in T[:3].flatten()) + "\n")
    poses = frame_utils.read_kitti_extrinsic(p)
    np.testing.assert_allclose(poses[0], np.linalg.inv(T), atol=1e-10)

    c = str(tmp_path / "calib_cam_to_cam.txt")
    with open(c, "w") as f:
        f.write("calib_time: 09-Jan-2012 13:57:47\n")
        f.write("P_rect_02: 7.2e+02 0 6.0e+02 4.5e+01 0 7.2e+02 1.8e+02 0 0 0 1 0\n")
    calib = frame_utils.read_calib_file(c)
    K = frame_utils.intrinsics_from_p_rect(calib["P_rect_02"])
    assert K[0, 0] == 720.0 and K[0, 2] == 600.0 and K[1, 2] == 180.0


# ---------------------------------------------------------------------------
# augmentor
# ---------------------------------------------------------------------------


def test_color_jitter_identity_when_degenerate(rng):
    img = rng.integers(0, 255, size=(8, 8, 3)).astype(np.uint8)
    cj = ColorJitter(brightness=0.0, contrast=0.0, saturation=(1.0, 1.0), hue=0.0)
    out = cj(img, np.random.default_rng(0))
    np.testing.assert_allclose(out, img, atol=1)


def test_adjust_hue_properties(rng):
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.float32)
    # full turn is identity
    np.testing.assert_allclose(adjust_hue(img, 1.0), img, atol=1e-2)
    # 1/3 turn rotates pure primaries R→G→B
    red = np.zeros((2, 2, 3), np.float32)
    red[..., 0] = 200.0
    green = adjust_hue(red, 1.0 / 3.0)
    np.testing.assert_allclose(green[..., 1], 200.0, atol=1e-3)
    np.testing.assert_allclose(green[..., 0], 0.0, atol=1e-3)
    # grayscale is hue-invariant
    gray = np.full((3, 3, 3), 128.0, np.float32)
    np.testing.assert_allclose(adjust_hue(gray, 0.25), gray, atol=1e-3)


def make_seq(rng, T=2, h=H, w=W):
    seq1 = rng.integers(0, 255, size=(T, h, w, 3)).astype(np.uint8)
    seq2 = rng.integers(0, 255, size=(T, h, w, 3)).astype(np.uint8)
    flow = -rng.uniform(0, 30, size=(T, h, w, 1)).astype(np.float32)
    valid = np.ones((T, h, w, 1), np.float32)
    K = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
    return seq1, seq2, flow, valid, K


def test_temporal_augmentor_shapes_and_K(rng):
    aug = TemporalFlowAugmentor(crop_size=(64, 96), min_scale=-0.2, max_scale=0.4)
    seq1, seq2, flow, valid, K = make_seq(rng)
    arng = np.random.default_rng(7)
    s1, s2, f, v, K2 = aug(seq1, seq2, flow, valid, K, arng)
    assert s1.shape == (2, 64, 96, 3) and s2.shape == (2, 64, 96, 3)
    assert f.shape == (2, 64, 96, 1) and v.shape == (2, 64, 96, 1)
    # K must reflect scale & crop: reconstruct expected from the transform
    # (scale then shift) — verify focal scaled within the sampled range
    assert K2[0, 0] != K[0, 0] or K2[0, 2] != K[0, 2]
    assert K2[2, 2] == 1.0
    # determinism
    s1b, *_ = aug(seq1, seq2, flow, valid, K, np.random.default_rng(7))
    np.testing.assert_array_equal(s1, s1b)


def test_sparse_augmentor(rng):
    aug = TemporalSparseFlowAugmentor(crop_size=(64, 96))
    seq1, seq2, flow, valid, K = make_seq(rng)
    valid[:, ::3] = 0.0
    s1, s2, f, v, K2 = aug(seq1, seq2, flow, valid, K, np.random.default_rng(3))
    assert set(np.unique(v)).issubset({0.0, 1.0})


def test_resize_sparse_flow_map_upscale_exact(rng):
    """Integer upscale: each valid pixel lands exactly at (2x, 2y) with flow
    doubled; the reference's strict >0 in-bounds test drops row/col 0
    (augmentor.py:210-216 — quirk preserved)."""
    from tcs_tpu.data.augmentor import resize_sparse_flow_map

    h, w = 8, 10
    flow = np.zeros((h, w, 1), np.float32)
    valid = np.zeros((h, w, 1), np.float32)
    pts = [(0, 3), (2, 0), (2, 5), (5, 7), (7, 9)]
    for i, (y, x) in enumerate(pts):
        valid[y, x, 0] = 1.0
        flow[y, x, 0] = -(i + 1.0)
    f2, v2 = resize_sparse_flow_map(flow, valid, fx=2.0, fy=2.0)
    assert f2.shape == (16, 20, 1) and v2.shape == (16, 20, 1)
    # (0,3) dropped (y*2 == 0 fails the >0 test); (2,0) dropped (x*2 == 0)
    assert v2.sum() == 3
    for i, (y, x) in enumerate(pts):
        if y == 0 or x == 0:
            continue
        assert v2[2 * y, 2 * x, 0] == 1.0
        assert f2[2 * y, 2 * x, 0] == pytest.approx(2.0 * -(i + 1.0))
    # everything else zero — no bilinear smearing
    assert np.count_nonzero(f2) == 3


def test_resize_sparse_flow_map_downscale_no_smear():
    """Downscale keeps validity sparse: valid count can only shrink
    (collisions, out-of-bounds), never grow the way a dense ==1 resize
    smears into neighbours."""
    from tcs_tpu.data.augmentor import resize_sparse_flow_map

    rng = np.random.default_rng(0)
    h, w = 40, 60
    valid = (rng.random((h, w, 1)) < 0.05).astype(np.float32)
    flow = np.where(valid > 0, rng.uniform(-30, 0, (h, w, 1)), 0.0).astype(
        np.float32)
    f2, v2 = resize_sparse_flow_map(flow, valid, fx=0.6, fy=0.6)
    assert f2.shape == (24, 36, 1)
    assert 0 < v2.sum() <= valid.sum()
    # flow defined only where valid
    assert np.all((np.abs(f2[..., 0]) > 0) <= (v2[..., 0] > 0))


def test_single_pair_sparse_augmentor_scatters(rng):
    """SparseFlowAugmentor (true sparse GT, e.g. KITTI 2015 labels) must
    preserve ~the input density through a scaled resize; the dense ==1 path
    would wipe isolated valid pixels to ~zero density."""
    from tcs_tpu.data.augmentor import SparseFlowAugmentor

    h, w = 120, 160
    g = np.random.default_rng(11)
    img1 = g.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    img2 = g.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    valid = (g.random((h, w, 1)) < 0.05).astype(np.float32)
    flow = np.where(valid > 0, g.uniform(-30, -1, (h, w, 1)), 0.0).astype(
        np.float32)

    aug = SparseFlowAugmentor(crop_size=(64, 96), min_scale=-0.2,
                              max_scale=0.4)
    assert aug.scatter_resize
    aug.spatial_aug_prob = 1.0  # force the resize path
    s1, s2, f, v, K = aug.augment_pair(img1, img2, flow, valid,
                                       rng=np.random.default_rng(5))
    density = v.mean()
    assert 0.01 < density < 0.12, density
    # values stay pure scatter copies: flow only where valid, and within
    # the scaled input range (no interpolated in-between values)
    assert np.all((np.abs(f[..., 0]) > 0) <= (v[..., 0] > 0))
    assert f.min() >= -30 * 2 ** 0.4 - 1e-5


def test_native_color_jitter_matches_numpy_oracle(rng):
    """The GIL-released C++ jitter (native/tcs_io.cc tcs_color_jitter) must
    reproduce the numpy pipeline to ≤1 uint8 LSB for any op order/factors."""
    from tcs_tpu.data import native_io
    from tcs_tpu.data import augmentor as A

    if not native_io.has_color_jitter():
        pytest.skip("native lib without color_jitter")
    img = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
    for seed in range(10):
        r = np.random.default_rng(seed)
        order = r.permutation(4)
        fb, fc, fs = (r.uniform(0.6, 1.4) for _ in range(3))
        hue = r.uniform(-0.16, 0.16)
        gamma, gain = r.uniform(0.8, 1.2), r.uniform(0.9, 1.1)
        nat = native_io.color_jitter(img.astype(np.float32), order,
                                     fb, fc, fs, hue, gamma, gain)
        out = img.astype(np.float32)
        ops = [lambda x: A.adjust_brightness(x, fb),
               lambda x: A.adjust_contrast(x, fc),
               lambda x: A.adjust_saturation(x, fs),
               lambda x: A.adjust_hue(x, hue)]
        for i in order:
            out = ops[i](out)
        out = A.adjust_gamma(out, gamma, gain)
        diff = np.abs(np.round(nat) - np.round(out))
        assert diff.max() <= 1.0, (seed, diff.max())
        assert (diff > 0).mean() < 0.02  # disagreements are rare rounding ties


def test_temporal_augmentor_rejects_do_flip(rng):
    """Temporal augmentors refuse do_flip (flips invalidate carried poses;
    the reference accepts the flag and silently never flips,
    augmentor.py:288-531 has no flip block)."""
    import pytest as _pytest

    for cls in (TemporalFlowAugmentor, TemporalSparseFlowAugmentor):
        with _pytest.raises(ValueError, match="do_flip"):
            cls(crop_size=(64, 96), do_flip="h")
    with _pytest.raises(ValueError, match="do_flip"):
        TemporalFlowAugmentor(crop_size=(64, 96), do_flip="bogus")


def test_yjitter_right_row_offset(rng):
    """yjitter crops the right image at a ±2px row offset against the
    left/flow crop (reference augmentor.py:417-431). Verified by feeding a
    row-index ramp as the right image: the cropped right rows differ from
    the left crop origin by exactly the jitter."""
    aug = TemporalFlowAugmentor(crop_size=(64, 96), yjitter=True)
    aug.spatial_aug_prob = 0.0  # keep pixels unresized so rows are readable
    T, h, w = 2, 100, 140
    ramp = np.broadcast_to(
        np.arange(h, dtype=np.float32)[None, :, None, None], (T, h, w, 3)
    ).astype(np.float32).copy()
    flow = -np.ones((T, h, w, 1), np.float32)
    valid = np.ones((T, h, w, 1), np.float32)
    K = np.array([[100.0, 0, w / 2], [0, 100.0, h / 2], [0, 0, 1]])
    seen = set()
    for seed in range(40):
        s1, s2, f, v, K2 = aug.spatial_transform(
            ramp, ramp, flow, valid, K.copy(), np.random.default_rng(seed)
        )
        assert s1.shape == (T, 64, 96, 3) and s2.shape == (T, 64, 96, 3)
        y_left = float(s1[0, 0, 0, 0])
        y_right = float(s2[0, 0, 0, 0])
        # K shift records the LEFT crop origin, with the 2px safety margin.
        y0 = h / 2 - K2[1, 2]
        assert 2 <= y_left <= h - 64 - 3
        assert y0 == y_left
        seen.add(round(y_right - y_left))
    # jitter must actually vary, within ±2 rows
    assert len(seen) > 1
    assert all(-2 <= d <= 2 for d in seen)
    assert any(d != 0 for d in seen)


def test_single_pair_flips(rng):
    """do_flip semantics in the single-pair augmentors
    (reference augmentor.py:106-124)."""
    from tcs_tpu.data.augmentor import FlowAugmentor, SparseFlowAugmentor

    h, w = 80, 120
    img1 = rng.integers(0, 255, size=(1, h, w, 3)).astype(np.float32)
    img2 = rng.integers(0, 255, size=(1, h, w, 3)).astype(np.float32)
    flow = -rng.uniform(0, 30, size=(1, h, w, 1)).astype(np.float32)
    valid = np.ones((1, h, w, 1), np.float32)
    valid[:, :, ::4] = 0.0

    # 'hf': both flipped horizontally, x-flow negated, valid flipped.
    aug = FlowAugmentor(crop_size=(64, 96), do_flip="hf")
    aug.h_flip_prob = 1.0
    s1, s2, f, v = aug.flip_transform(img1, img2, flow, valid,
                                      np.random.default_rng(0))
    np.testing.assert_array_equal(s1, img1[:, :, ::-1])
    np.testing.assert_array_equal(s2, img2[:, :, ::-1])
    np.testing.assert_array_equal(f, -flow[:, :, ::-1])
    np.testing.assert_array_equal(v, valid[:, :, ::-1])

    # 'h': stereo swap — new left = flipped right, flow untouched.
    aug = SparseFlowAugmentor(crop_size=(64, 96), do_flip="h")
    aug.h_flip_prob = 1.0
    s1, s2, f, v = aug.flip_transform(img1, img2, flow, valid,
                                      np.random.default_rng(0))
    np.testing.assert_array_equal(s1, img2[:, :, ::-1])
    np.testing.assert_array_equal(s2, img1[:, :, ::-1])
    np.testing.assert_array_equal(f, flow)

    # 'v': vertical flip of everything (y-flow is identically zero here).
    aug = FlowAugmentor(crop_size=(64, 96), do_flip="v")
    aug.v_flip_prob = 1.0
    s1, s2, f, v = aug.flip_transform(img1, img2, flow, valid,
                                      np.random.default_rng(0))
    np.testing.assert_array_equal(s1, img1[:, ::-1])
    np.testing.assert_array_equal(f, flow[:, ::-1])
    np.testing.assert_array_equal(v, valid[:, ::-1])

    # prob 0 → identity
    aug = FlowAugmentor(crop_size=(64, 96), do_flip="hf")
    aug.h_flip_prob = 0.0
    s1, s2, f, v = aug.flip_transform(img1, img2, flow, valid,
                                      np.random.default_rng(0))
    np.testing.assert_array_equal(s1, img1)

    # end-to-end through augment_pair (flip inside the spatial pipeline)
    aug = FlowAugmentor(crop_size=(64, 96), do_flip="hf")
    aug.h_flip_prob = 1.0
    o1, o2, of, ov, K2 = aug.augment_pair(
        img1[0].astype(np.uint8), img2[0].astype(np.uint8), flow[0],
        rng=np.random.default_rng(1),
    )
    assert o1.shape == (64, 96, 3) and of.shape == (64, 96, 1)
    assert (of > 0).mean() > 0.9  # negated x-flow is now positive


def test_eraser_consistent_across_frames(rng):
    aug = TemporalFlowAugmentor(crop_size=(64, 96))
    seq1, seq2, flow, valid, K = make_seq(rng, T=3)
    # force eraser
    aug.eraser_aug_prob = 1.0
    out2 = aug.eraser_transform(seq2.astype(np.float32), np.random.default_rng(0))
    changed = (out2 != seq2).any(axis=-1)  # (T,h,w)
    # identical erased region in every frame
    assert changed.any()
    assert (changed[0] == changed[1]).all() and (changed[1] == changed[2]).all()


# ---------------------------------------------------------------------------
# datasets + loader on a synthetic TartanAir tree
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fake_tartanair(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    n_frames = 6
    for scene, diff, part in [("gascola", "Easy", "P001"),
                              ("gascola", "Easy", "P005"),
                              ("hospital", "Hard", "P042")]:
        base = root / "TartanAir" / scene / scene / diff / part
        (base / "image_left").mkdir(parents=True)
        (base / "image_right").mkdir(parents=True)
        (base / "depth_left").mkdir(parents=True)
        poses = []
        for i in range(n_frames):
            img = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
            Image.fromarray(img).save(base / "image_left" / f"{i:06d}_left.png")
            Image.fromarray(img).save(base / "image_right" / f"{i:06d}_right.png")
            np.save(base / "depth_left" / f"{i:06d}_left_depth.npy",
                    rng.uniform(2, 30, size=(H, W)).astype(np.float32))
            poses.append(f"{0.1*i} 0 0 0 0 0 1")
        (base / "pose_left.txt").write_text("\n".join(poses) + "\n")
    return str(root)


def test_tartanair_split_and_index(fake_tartanair):
    kws = tartanair_test_keywords()  # includes gascola/Easy/P001, hospital/Hard/P042
    train = TartanAir({"crop_size": (64, 96), "min_scale": -0.2,
                       "max_scale": 0.4, "do_flip": False, "yjitter": False},
                      root=fake_tartanair, test_keywords=kws,
                      mode="temporal", frame_sample_length=2)
    test = TartanAir(None, root=fake_tartanair, test_keywords=kws,
                     is_test=True, mode="temporal")
    assert len(train) == 1  # only gascola/Easy/P005 survives the blacklist
    assert len(test) == 2
    i1, i2, disp, pose = test.test_sequence(0)
    assert len(i1) == len(i2) == len(disp) == len(pose) == 6


def test_tartanair_load_sample(fake_tartanair):
    kws = tartanair_test_keywords()
    ds = TartanAir({"crop_size": (64, 96), "min_scale": -0.2,
                    "max_scale": 0.4, "do_flip": False, "yjitter": False},
                   root=fake_tartanair, test_keywords=kws,
                   mode="temporal", frame_sample_length=3)
    s = ds.load_sample(0, np.random.default_rng(0))
    assert s["image1"].shape == (3, 64, 96, 3)
    assert s["flow"].shape == (3, 64, 96, 1)
    assert s["T"].shape == (3, 4, 4)
    assert s["K"].shape == (3, 3)
    assert float(s["baseline"]) == 0.25
    assert s["flow"].max() <= 0.0  # flow = −disp


def test_loader_batching_sharding(fake_tartanair):
    kws = tartanair_test_keywords()
    ds = TartanAir({"crop_size": (64, 96), "min_scale": -0.2,
                    "max_scale": 0.4, "do_flip": False, "yjitter": False},
                   root=fake_tartanair, test_keywords=kws,
                   mode="temporal", frame_sample_length=2) * 8
    loader = SequenceLoader(ds, batch_size=2, seed=1, num_workers=1)
    loader.set_epoch(1)
    batches = list(loader)
    assert len(batches) == len(loader) == 4
    b = batches[0]
    assert b["image1"].shape == (2, 2, 64, 96, 3)
    assert b["K"].shape == (2, 3, 3)

    # shard splitting: two shards see disjoint work of equal size
    l0 = SequenceLoader(ds, batch_size=2, seed=1, shard_id=0, num_shards=2)
    l1 = SequenceLoader(ds, batch_size=2, seed=1, shard_id=1, num_shards=2)
    assert len(l0) == len(l1) == 2
    i0 = l0._epoch_indices()
    i1 = l1._epoch_indices()
    assert len(set(map(int, i0)) & set(map(int, i1))) <= 0  # disjoint (8 % 2 == 0)


def test_loader_workers_deterministic(fake_tartanair):
    """num_workers must change throughput only — identical batches in the
    same order for 1 vs 4 workers (sample RNG is keyed by
    (seed, epoch, global_index), never by worker identity)."""
    kws = tartanair_test_keywords()
    ds = TartanAir({"crop_size": (64, 96), "min_scale": -0.2,
                    "max_scale": 0.4, "do_flip": False, "yjitter": False},
                   root=fake_tartanair, test_keywords=kws,
                   mode="temporal", frame_sample_length=2) * 8
    l1 = SequenceLoader(ds, batch_size=2, seed=1, num_workers=1, prefetch=2)
    l4 = SequenceLoader(ds, batch_size=2, seed=1, num_workers=4, prefetch=2)
    l1.set_epoch(3)
    l4.set_epoch(3)
    b1 = list(l1)
    b4 = list(l4)
    assert len(b1) == len(b4) == 4
    for a, b in zip(b1, b4):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_loader_worker_error_propagates(fake_tartanair):
    kws = tartanair_test_keywords()
    ds = TartanAir({"crop_size": (64, 96), "min_scale": -0.2,
                    "max_scale": 0.4, "do_flip": False, "yjitter": False},
                   root=fake_tartanair, test_keywords=kws,
                   mode="temporal", frame_sample_length=2) * 4

    class Boom(Exception):
        pass

    orig = ds.load_sample
    calls = []

    def failing(idx, rng):
        calls.append(idx)
        if len(calls) == 3:
            raise Boom("decode failed")
        return orig(idx, rng)

    ds.load_sample = failing
    loader = SequenceLoader(ds, batch_size=2, seed=1, num_workers=4)
    with pytest.raises(Boom):
        list(loader)


def test_single_pair_as_sequence_adapter(tmp_path, rng):
    """Single-pair datasets train as T=1 sequences through the same loader
    (reference single-frame mixtures, stereo_datasets.py:666-702); the
    concat keeps each part's own reader."""
    from tcs_tpu.data.datasets import (SinglePairAsSequence,
                                       StereoSequenceDataset)

    def make_pair_ds(subdir, reader, n=2, sparse=False):
        d = tmp_path / subdir
        d.mkdir()
        ds = StereoSequenceDataset(
            {"crop_size": (48, 64), "min_scale": -0.2, "max_scale": 0.2,
             "do_flip": False, "yjitter": False},
            sparse=sparse,
        )
        for i in range(n):
            img = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
            p1, p2 = str(d / f"l{i}.png"), str(d / f"r{i}.png")
            Image.fromarray(img).save(p1)
            Image.fromarray(img).save(p2)
            disp = (rng.uniform(0, 30, size=(80, 100)) * 256).astype(np.uint16)
            pd = str(d / f"d{i}.png")
            Image.fromarray(disp).save(pd)
            ds.image_list.append([p1, p2])
            ds.disparity_list.append(pd)
        ds.disparity_reader = reader
        return ds

    calls = {"a": 0, "b": 0}

    def reader_a(p):
        calls["a"] += 1
        return frame_utils.readDispKITTI(p)

    def reader_b(p):
        calls["b"] += 1
        return frame_utils.readDispKITTI(p)

    a = SinglePairAsSequence(make_pair_ds("a", reader_a, sparse=True))
    b = SinglePairAsSequence(make_pair_ds("b", reader_b))
    mix = a * 2 + b
    assert len(mix) == 6
    s = mix.load_sample(0, np.random.default_rng(0))
    assert s["image1"].shape == (1, 48, 64, 3)
    assert s["T"].shape == (1, 4, 4) and s["K"].shape == (3, 3)
    mix.load_sample(5, np.random.default_rng(0))  # falls into part b
    assert calls["a"] == 1 and calls["b"] == 1

    # loader batches T=1 sequences like any temporal dataset
    loader = SequenceLoader(mix, batch_size=2, seed=0, num_workers=2)
    batch = next(iter(loader))
    assert batch["image1"].shape == (2, 1, 48, 64, 3)
    assert batch["T"].shape == (2, 1, 4, 4)

    # fetch_dataset refuses single-pair mixtures with frame_length > 1
    import dataclasses

    from tcs_tpu.config import TrainConfig
    from tcs_tpu.data.datasets import fetch_dataset

    cfg = dataclasses.replace(TrainConfig(), train_dataset="sintel_stereo",
                              frame_length=2, data_root=str(tmp_path))
    with pytest.raises(ValueError, match="frame_length"):
        fetch_dataset(cfg)


def test_fetch_dataset_single_frame_tartanair(fake_tartanair):
    """temporal=False routes TartanAir through its single_frame constructor
    as T=1 sequences (reference fetch_dataloader with no --temporal,
    stereo_datasets.py:713-716: scale factor 1, flat frame index)."""
    import dataclasses

    from tcs_tpu.config import TrainConfig
    from tcs_tpu.data.datasets import fetch_dataset

    cfg = dataclasses.replace(
        TrainConfig(), train_dataset="TartanAir", temporal=False,
        frame_length=1, data_root=fake_tartanair, image_size=(64, 96))
    ds = fetch_dataset(cfg)
    # only gascola/Easy/P005 survives the blacklist: 6 flat frames, no ×100
    assert len(ds) == 6
    s = ds.load_sample(0, np.random.default_rng(0))
    assert s["image1"].shape == (1, 64, 96, 3)
    assert s["flow"].shape == (1, 64, 96, 1)
    assert s["T"].shape == (1, 4, 4)
    assert s["flow"].max() <= 0.0

    # temporal single-frame misuse is rejected with a clear error
    cfg_bad = dataclasses.replace(cfg, frame_length=4)
    with pytest.raises(ValueError, match="frame_length=1"):
        fetch_dataset(cfg_bad)


def test_fetch_dataset_kitti_gt(tmp_path):
    """The 'kitti' branch (reference stereo_datasets.py:691-696): KITTI
    2015+2012 GT pairs, sparse scatter augmentation, single-frame only."""
    import dataclasses

    from tcs_tpu.config import TrainConfig
    from tcs_tpu.data.datasets import fetch_dataset

    g = np.random.default_rng(2)
    root = tmp_path / "KITTI"
    for sub, imdirs, ddir in [
        ("Kitti15", ("image_2", "image_3"), "disp_occ_0"),
        ("Kitti12", ("image_0", "image_1"), "disp_occ"),
    ]:
        for d in imdirs + (ddir,):
            (root / sub / "training" / d).mkdir(parents=True)
        for i in range(2):
            for d in imdirs:
                img = g.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
                Image.fromarray(img).save(
                    root / sub / "training" / d / f"{i:06d}_10.png")
            disp = np.zeros((96, 128), np.uint16)
            yy = g.integers(1, 95, size=300)
            xx = g.integers(1, 127, size=300)
            disp[yy, xx] = (g.uniform(1, 40, size=300) * 256).astype(np.uint16)
            Image.fromarray(disp).save(
                root / sub / "training" / ddir / f"{i:06d}_10.png")

    cfg = dataclasses.replace(
        TrainConfig(), train_dataset="kitti", temporal=False, frame_length=1,
        data_root=str(tmp_path), image_size=(64, 96))
    ds = fetch_dataset(cfg)
    assert len(ds) == 4  # 2 from Kitti15 + 2 from Kitti12
    s = ds.load_sample(0, np.random.default_rng(1))
    assert s["image1"].shape == (1, 64, 96, 3)
    assert set(np.unique(s["valid"])).issubset({0.0, 1.0})
    assert 0.0 < s["valid"].mean() < 0.2  # stays sparse through augmentation

    with pytest.raises(NotImplementedError, match="single-frame"):
        fetch_dataset(dataclasses.replace(cfg, temporal=True))


def test_kitti_raw_single_frame_flat(tmp_path):
    """KITTIraw single_frame indexes frames flat (the reference's own
    single_frame KITTIraw keeps windowed lists and would crash in its
    single-pair __getitem__ — stereo_datasets.py:615-627 vs :164-182)."""
    from tcs_tpu.data.datasets import KITTIraw

    g = np.random.default_rng(3)
    date = tmp_path / "kitti_raw" / "2011_09_26"
    seq = date / "2011_09_26_drive_0001_sync"
    for d in ("image_02/data", "image_03/data", "leastereo/data"):
        (seq / d).mkdir(parents=True)
    poses = []
    for i in range(5):
        for d in ("image_02/data", "image_03/data"):
            img = g.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
            Image.fromarray(img).save(seq / d / f"{i:010d}.png")
        disp = (g.uniform(1, 40, size=(96, 128)) * 256).astype(np.uint16)
        Image.fromarray(disp).save(seq / "leastereo" / "data" / f"{i:010d}.png")
        T = np.eye(4)
        poses.append(" ".join(str(v) for v in T[:3].reshape(-1)))
    (seq / "pose.txt").write_text("\n".join(poses) + "\n")
    (date / "calib_cam_to_cam.txt").write_text(
        "P_rect_02: 700 0 60 0 0 700 45 0 0 0 1 0\n")

    ds = KITTIraw({"crop_size": (64, 96), "min_scale": -0.2,
                   "max_scale": 0.2, "do_flip": False, "yjitter": False},
                  root=str(tmp_path / "kitti_raw"), mode="single_frame")
    assert len(ds) == 5  # flat frames, not len-4 windows (which would be 2)
    s = ds.load_pair(0, np.random.default_rng(0))
    assert s["image1"].shape == (64, 96, 3)
    assert s["flow"].shape == (64, 96, 1)


def test_sharded_eval_matches_serial(fake_tartanair):
    """validate_tartanair over the 8-device CPU mesh produces the same
    metrics as the single-device streaming path (sequences sharded over the
    mesh, one stream per device — reference nn.DataParallel analogue,
    evaluate_stereo.py:392)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from tcs_tpu.config import ModelConfig
    from tcs_tpu.evaluate import validate_tartanair
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.parallel import mesh as mesh_lib

    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32")
    model = TCStereo(cfg=cfg)
    state0 = TemporalState.zeros(1, 64, 96, cfg)
    cam = CameraParams(K=jnp.eye(3)[None], baseline=jnp.ones((1,)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                        jnp.zeros((1, 64, 96, 3)), state0, cam,
                        jnp.eye(4)[None], iters=1, test_mode=True)

    kw = dict(iters=1, root=fake_tartanair, max_sequences=2, max_frames=3)
    serial = validate_tartanair(model, params, cfg, **kw)
    mesh = mesh_lib.create_mesh(jax.devices()[:8])
    sharded = validate_tartanair(model, params, cfg, mesh=mesh, **kw)
    assert serial.keys() == sharded.keys()
    for k in serial:
        np.testing.assert_allclose(sharded[k], serial[k], rtol=1e-4,
                                   atol=1e-5, err_msg=k)


# ---------------------------------------------------------------------------
# native IO core
# ---------------------------------------------------------------------------


def test_native_io_parity(tmp_path, rng):
    from tcs_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native lib not built")
    img = rng.integers(0, 255, size=(50, 70, 3)).astype(np.uint8)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(native_io.read_png(p), img)

    d16 = (rng.uniform(0, 90, size=(40, 60)) * 256).astype(np.uint16)
    p16 = str(tmp_path / "d.png")
    Image.fromarray(d16).save(p16)
    np.testing.assert_array_equal(native_io.read_png(p16), d16)
    disp, valid = frame_utils.readDispKITTI(p16)
    np.testing.assert_allclose(disp, d16.astype(np.float32) / 256.0, atol=1e-6)

    arr = rng.normal(size=(30, 40)).astype(np.float32)
    pp = str(tmp_path / "x.pfm")
    frame_utils.writePFM(pp, arr)
    np.testing.assert_allclose(native_io.read_pfm(pp), arr, atol=1e-6)

    # resize parity with the pure-numpy implementation
    from tcs_tpu.data.augmentor import _resize_bilinear_np

    x = rng.normal(size=(37, 53, 3)).astype(np.float32)
    a = native_io.resize_bilinear(x, 64, 96)
    # numpy reference path (bypass the native dispatch)
    H, W = x.shape[:2]
    ys = (np.arange(64) + 0.5) * (H / 64) - 0.5
    xs = (np.arange(96) + 0.5) * (W / 96) - 0.5
    y0 = np.clip(np.floor(ys), 0, H - 1).astype(int)
    x0 = np.clip(np.floor(xs), 0, W - 1).astype(int)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = x[y0][:, x0] * (1 - fx) + x[y0][:, x1] * fx
    bot = x[y1][:, x0] * (1 - fx) + x[y1][:, x1] * fx
    b = top * (1 - fy) + bot * fy
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_single_pair_loading(tmp_path, rng):
    """load_pair path with a sparse augmentor (ETH3D-style single pairs)."""
    from tcs_tpu.data.datasets import StereoSequenceDataset

    ds = StereoSequenceDataset(
        {"crop_size": (48, 64), "min_scale": -0.2, "max_scale": 0.2,
         "do_flip": False, "yjitter": False},
        sparse=True,
    )
    img = rng.integers(0, 255, size=(80, 100, 3)).astype(np.uint8)
    p1, p2 = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    Image.fromarray(img).save(p1)
    Image.fromarray(img).save(p2)
    disp = (rng.uniform(0, 30, size=(80, 100)) * 256).astype(np.uint16)
    pd = str(tmp_path / "d.png")
    Image.fromarray(disp).save(pd)
    ds.image_list = [[p1, p2]]
    ds.disparity_list = [pd]
    ds.disparity_reader = frame_utils.readDispKITTI
    s = ds.load_pair(0, np.random.default_rng(0))
    assert s["image1"].shape == (48, 64, 3)
    assert s["flow"].shape == (48, 64, 1)
    assert s["flow"].max() <= 0.0
    assert set(np.unique(s["valid"])).issubset({0.0, 1.0})


def test_submit_kitti_end_to_end(tmp_path):
    """submit_kitti smoke over a fabricated KITTI-seq tree (reference
    evaluate_stereo.py:28-117): per-scene P_rect_02 intrinsics, ORB-SLAM3
    pose file, temporal state carried over 11 frames, and the frame-10
    disparity written as the uint16 x256 submission PNG."""
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.evaluate import submit_kitti
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState

    H, W = 64, 96
    scene = tmp_path / "kitti_seq" / "kitti2015_testings" / "sequences" / "000000"
    (scene / "image_2").mkdir(parents=True)
    (scene / "image_3").mkdir(parents=True)
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H, W + 16, 3)).astype(np.uint8)
    for t in range(11):
        # a horizontally sliding static scene; right image shifted 4 px
        l = base[:, t : t + W]
        r = np.roll(l, 4, axis=1)
        Image.fromarray(l).save(scene / "image_2" / f"{t:06d}.png")
        Image.fromarray(r).save(scene / "image_3" / f"{t:06d}.png")
    poses = []
    for t in range(11):
        T = np.eye(4)[:3].copy()
        T[0, 3] = 0.01 * t
        poses.append(" ".join(f"{v:.6f}" for v in T.reshape(-1)))
    (scene / "orbslam3_pose.txt").write_text("\n".join(poses) + "\n")
    p = [100.0, 0.0, W / 2, 0.0, 0.0, 100.0, H / 2, 0.0, 0.0, 0.0, 1.0, 0.0]
    (scene / "000000.txt").write_text(
        "P_rect_02: " + " ".join(str(v) for v in p) + "\n")

    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32")
    model = TCStereo(cfg=cfg)
    state0 = TemporalState.zeros(1, H, W, cfg)
    cam = CameraParams(K=jnp.eye(3)[None], baseline=jnp.ones((1,)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                        jnp.zeros((1, H, W, 3)), state0, cam,
                        jnp.eye(4)[None], iters=1, test_mode=True)

    out_dir = tmp_path / "out"
    results = submit_kitti(model, params, cfg, iters=2, root=str(tmp_path),
                           out_dir=str(out_dir), submission=True)
    assert "kitti-fps" in results
    png = out_dir / "disp_0" / "000000_10.png"
    assert png.exists()
    img = Image.open(png)
    arr = np.array(img)
    assert arr.dtype == np.uint16 and arr.shape == (H, W)
    # x256 encoding of a finite non-negative disparity
    assert arr.max() >= 0 and np.isfinite(arr.astype(np.float64)).all()


# ---------------------------------------------------------------------------
# SceneFlow (FlyingThings3D + Monkaa + Driving) on a fabricated tree
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fake_sceneflow(tmp_path_factory):
    """Fabricated SceneFlow layout (reference stereo_datasets.py:247-402):
    FlyingThings3D TRAIN/TEST with camera_data.txt poses, Monkaa, and
    Driving with 15mm/35mm focal-length subtrees. One FT TRAIN scene has a
    trailing frame without a pose (the reference trims it, :283-289)."""
    root = tmp_path_factory.mktemp("sceneflow")
    g = np.random.default_rng(7)
    h, w = 64, 96

    def write_scene(img_dir, disp_dir, pose_path, n_imgs, n_poses):
        (img_dir / "left").mkdir(parents=True)
        (img_dir / "right").mkdir(parents=True)
        (disp_dir / "left").mkdir(parents=True)
        for i in range(n_imgs):
            img = g.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
            Image.fromarray(img).save(img_dir / "left" / f"{i:04d}.png")
            Image.fromarray(np.roll(img, 4, axis=1)).save(
                img_dir / "right" / f"{i:04d}.png")
            frame_utils.writePFM(
                str(disp_dir / "left" / f"{i:04d}.pfm"),
                g.uniform(1, 30, size=(h, w)).astype(np.float32))
        if n_poses is not None:
            pose_path.parent.mkdir(parents=True, exist_ok=True)
            lines = []
            for i in range(n_poses):
                T = np.eye(4)
                T[0, 3] = 0.1 * i  # cam->world; the parser inverts
                lines.append("L " + " ".join(
                    f"{v:.6f}" for v in T.reshape(-1)))
                lines.append("R " + " ".join(
                    f"{v:.6f}" for v in T.reshape(-1)))
            pose_path.write_text("\n".join(lines) + "\n")

    ft = root / "FlyingThings3D"
    # TRAIN: scene A/0000 (5 frames, 5 poses), B/0001 (4 frames, 3 poses —
    # the trailing un-posed frame the reference trims)
    write_scene(ft / "frames_cleanpass/TRAIN/A/0000",
                ft / "disparity/TRAIN/A/0000",
                ft / "pose/TRAIN/A/0000/camera_data.txt", 5, 5)
    write_scene(ft / "frames_cleanpass/TRAIN/B/0001",
                ft / "disparity/TRAIN/B/0001",
                ft / "pose/TRAIN/B/0001/camera_data.txt", 4, 3)
    # TEST: two scenes for things_test index-by-scene
    write_scene(ft / "frames_cleanpass/TEST/A/0000",
                ft / "disparity/TEST/A/0000",
                ft / "pose/TEST/A/0000/camera_data.txt", 3, 3)
    write_scene(ft / "frames_cleanpass/TEST/A/0001",
                ft / "disparity/TEST/A/0001",
                ft / "pose/TEST/A/0001/camera_data.txt", 4, 4)
    mk = root / "Monkaa"
    write_scene(mk / "frames_cleanpass/funnyworld_x2",
                mk / "disparity/funnyworld_x2",
                mk / "pose/funnyworld_x2/camera_data.txt", 4, 4)
    dr = root / "Driving"
    write_scene(dr / "frames_cleanpass/15mm_focallength/scene_forwards/fast",
                dr / "disparity/15mm_focallength/scene_forwards/fast",
                dr / "pose/15mm_focallength/scene_forwards/fast/camera_data.txt",
                3, 3)
    write_scene(dr / "frames_cleanpass/35mm_focallength/scene_forwards/slow",
                dr / "disparity/35mm_focallength/scene_forwards/slow",
                dr / "pose/35mm_focallength/scene_forwards/slow/camera_data.txt",
                3, 3)
    return str(root)


def test_sceneflow_temporal_train_index(fake_sceneflow):
    """Window slicing + per-subset K selection (reference
    stereo_datasets.py:247-402): FT windows (incl. the un-posed trailing
    frame trim), Monkaa, Driving 15mm vs 35mm intrinsics."""
    from tcs_tpu.data.datasets import (
        SCENEFLOW_K, SCENEFLOW_K_15MM, SceneFlowDatasets)

    ds = SceneFlowDatasets(None, root=fake_sceneflow, mode="temporal",
                           frame_sample_length=2)
    # FT A/0000: 5-2+1=4; FT B/0001 trimmed to 3 frames: 2; Monkaa 4: 3;
    # Driving 15mm 3: 2; Driving 35mm 3: 2.
    assert len(ds) == 4 + 2 + 3 + 2 + 2
    # every sample window is L consecutive frames with aligned pose count
    for i in range(len(ds)):
        l, r = ds.image_list[i]
        assert len(l) == len(r) == len(ds.disparity_list[i]) == 2
        assert len(ds.pose_list[i]) == 2
        assert all(a.replace("left", "right") == b for a, b in zip(l, r))
    # K selection: the two 15mm Driving windows carry the 450-focal K
    Ks = np.stack([np.asarray(k) for k in ds.intrinsic_K])
    n_15 = int((Ks[:, 0, 0] == SCENEFLOW_K_15MM[0, 0]).sum())
    n_1050 = int((Ks[:, 0, 0] == SCENEFLOW_K[0, 0]).sum())
    assert n_15 == 2 and n_1050 == len(ds) - 2
    fifteens = [i for i in range(len(ds))
                if "15mm_focallength" in ds.image_list[i][0][0]]
    assert all(ds.intrinsic_K[i][0, 0] == 450.0 for i in fifteens)
    assert len(fifteens) == 2

    # things_test temporal: index by scene, whole sequences
    dt = SceneFlowDatasets(None, root=fake_sceneflow, things_test=True,
                           mode="temporal")
    assert len(dt) == 2
    i1, i2, disp, pose = dt.test_sequence(1)
    assert len(i1) == len(i2) == len(disp) == len(pose) == 4


def test_sceneflow_single_frame_index(fake_sceneflow):
    """Non-temporal branch: flat pairs (TRAIN keeps all incl. the un-posed
    frame; TEST filters by the fixed seed-1000 val subset, which keeps all
    when the tree is smaller than 400)."""
    from tcs_tpu.data.datasets import SceneFlowDatasets

    ds = SceneFlowDatasets(None, root=fake_sceneflow, mode="single_frame")
    assert len(ds) == (5 + 4) + 4 + (3 + 3)  # FT TRAIN + Monkaa + Driving
    dt = SceneFlowDatasets(None, root=fake_sceneflow, things_test=True,
                           mode="single_frame")
    assert len(dt) == 3 + 4  # both TEST scenes, all in the val subset
    s = dt.load_pair(0, np.random.default_rng(0))
    assert s["image1"].shape == (64, 96, 3)
    assert s["flow"].max() <= 0.0


def test_sceneflow_temporal_load_sample(fake_sceneflow):
    """Temporal load: (L,H,W,·) stacks, world->cam poses (inverted from the
    cam->world camera_data rows), the 1050-focal K and baseline 1."""
    from tcs_tpu.data.datasets import SceneFlowDatasets

    ds = SceneFlowDatasets({"crop_size": (48, 64), "min_scale": -0.2,
                            "max_scale": 0.2, "do_flip": False,
                            "yjitter": False},
                           root=fake_sceneflow, mode="temporal",
                           frame_sample_length=2)
    s = ds.load_sample(0, np.random.default_rng(0))
    assert s["image1"].shape == (2, 48, 64, 3)
    assert s["flow"].shape == (2, 48, 64, 1)
    assert s["T"].shape == (2, 4, 4)
    assert s["flow"].max() <= 0.0
    assert float(s["baseline"]) == 1.0
    # pose 1 is inv(cam->world with tx=0.1): world->cam tx = -0.1
    np.testing.assert_allclose(s["T"][1][0, 3], -0.1, atol=1e-6)


def test_validate_temporal_things_end_to_end(fake_sceneflow):
    """validate_temporal_things smoke (reference evaluate_stereo.py:265-346):
    streams both TEST scenes with temporal state carried frame-to-frame,
    finite EPE/D1/D3 aggregated with valid-rate weighting."""
    import jax
    import jax.numpy as jnp

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.evaluate import validate_temporal_things
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState

    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32")
    model = TCStereo(cfg=cfg)
    state0 = TemporalState.zeros(1, 64, 96, cfg)
    cam = CameraParams(K=jnp.eye(3)[None], baseline=jnp.ones((1,)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                        jnp.zeros((1, 64, 96, 3)), state0, cam,
                        jnp.eye(4)[None], iters=1, test_mode=True)

    results = validate_temporal_things(model, params, cfg, iters=2,
                                       root=fake_sceneflow)
    assert set(results) == {"things-epe", "things-d1", "things-d3"}
    assert np.isfinite(results["things-epe"])
    assert 0.0 <= results["things-d1"] <= 100.0
    assert 0.0 <= results["things-d3"] <= 100.0


def test_kitti_raw_temporal_windows(tmp_path):
    """KITTIraw temporal indexing (reference stereo_datasets.py:581-632):
    len-L sliding windows per *_sync sequence, per-date P_rect_02 K,
    OXTS-pose alignment, sparse LEAStereo pseudo-labels."""
    from tcs_tpu.data.datasets import KITTIraw

    g = np.random.default_rng(5)
    date = tmp_path / "kitti_raw" / "2011_09_26"
    seq = date / "2011_09_26_drive_0001_sync"
    for d in ("image_02/data", "image_03/data", "leastereo/data"):
        (seq / d).mkdir(parents=True)
    poses = []
    for i in range(5):
        for d in ("image_02/data", "image_03/data"):
            img = g.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
            Image.fromarray(img).save(seq / d / f"{i:010d}.png")
        disp = np.zeros((96, 128), np.uint16)
        yy = g.integers(1, 95, size=400)
        xx = g.integers(1, 127, size=400)
        disp[yy, xx] = (g.uniform(1, 40, size=400) * 256).astype(np.uint16)
        Image.fromarray(disp).save(seq / "leastereo" / "data" / f"{i:010d}.png")
        T = np.eye(4)
        T[2, 3] = 0.5 * i  # cam->world forward motion
        poses.append(" ".join(str(v) for v in T[:3].reshape(-1)))
    (seq / "pose.txt").write_text("\n".join(poses) + "\n")
    (date / "calib_cam_to_cam.txt").write_text(
        "P_rect_02: 700 0 60 0 0 700 45 0 0 0 1 0\n")

    ds = KITTIraw(None, root=str(tmp_path / "kitti_raw"), mode="temporal",
                  frame_sample_length=4)
    assert len(ds) == 2  # 5 frames, L=4 -> 2 windows
    for i, k0 in enumerate((0, 1)):
        l, r = ds.image_list[i]
        assert [osp.basename(p) for p in l] == [
            f"{j:010d}.png" for j in range(k0, k0 + 4)]
        assert all("image_03" in p for p in r)
        assert len(ds.pose_list[i]) == 4
    np.testing.assert_allclose(ds.intrinsic_K[0][0, 0], 700.0)

    s = ds.load_sample(1, np.random.default_rng(0))
    assert s["image1"].shape == (4, 96, 128, 3)
    assert s["flow"].shape == (4, 96, 128, 1)
    assert s["T"].shape == (4, 4, 4)
    assert set(np.unique(s["valid"])).issubset({0.0, 1.0})
    assert 0.0 < s["valid"].mean() < 0.1  # lidar-sparse pseudo-labels
    np.testing.assert_allclose(float(s["baseline"]), 0.54, rtol=1e-6)
    # world->cam pose of window-1 frame 0: inv(tz=0.5) -> -0.5
    np.testing.assert_allclose(s["T"][0][2, 3], -0.5, atol=1e-6)
