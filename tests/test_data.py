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
