"""CLI tests (reference train_stereo.py:453-513 / evaluate_stereo.py:348-397).

Two layers:
- in-process flag→config mapping tests over ``scripts/train.py:build_config``
  and ``scripts/evaluate.py:build_model_config`` — a typo in the mapping
  table would previously have shipped silently;
- subprocess end-to-end smokes: ``train.py`` for 2 steps on a fabricated
  TartanAir tree (run completes, checkpoint appears), then ``evaluate.py``
  restoring that checkpoint.
"""

import importlib.util
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load_cli(name):
    spec = importlib.util.spec_from_file_location(
        f"{name}_cli", osp.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_train_cli_flag_mapping():
    """Every override flag lands in TrainConfig/ModelConfig (the 33-flag
    parity table, scripts/train.py docstring)."""
    cli = _load_cli("train")
    args = cli.parse_args([
        "--recipe", "TartanAir",
        "--data_root", "/data/x",
        "--checkpoint_dir", "/ckpt",
        "--restore_ckpt", "/ckpt/prev",
        "--num_steps", "17",
        "--batch_size", "3",
        "--lr", "5e-5",
        "--num_workers", "2",
        "--yjitter",
        "--train_dataset", "kitti",
        "--frame_length", "3",
        "--image_size", "96", "128",
        "--do_flip", "hf",
        "--name", "mapped",
        "--train_iters", "7",
        "--valid_iters", "9",
        "--wdecay", "1e-4",
        "--init_k", "2",
        "--spatial_scale", "-0.1", "0.3",
        "--saturation_range", "0.5", "1.1",
        "--img_gamma", "0.8", "1.2",
        "--init_thres", "0.6",
        "--corr_levels", "3",
        "--corr_radius", "5",
        "--n_downsample", "3",
        "--n_gru_layers", "3",
        "--hidden_dims", "96", "96", "96",
        "--context_norm", "batch",
        "--no_shared_backbone",
        "--slow_fast_gru",
        "--no_mixed_precision",
        "--frame_parallel_backward",
        "--frame_inline_backward",
    ])
    cfg = cli.build_config(args)
    assert cfg.data_root == "/data/x"
    assert cfg.checkpoint_dir == "/ckpt"
    assert cfg.restore_ckpt == "/ckpt/prev"
    assert cfg.num_steps == 17
    assert cfg.batch_size == 3
    assert cfg.lr == 5e-5
    assert cfg.num_workers == 2
    assert cfg.yjitter is True
    assert cfg.train_dataset == "kitti"
    assert cfg.frame_length == 3
    assert cfg.image_size == (96, 128)
    assert cfg.do_flip == "hf"
    assert cfg.name == "mapped"
    assert cfg.train_iters == 7
    assert cfg.valid_iters == 9
    assert cfg.wdecay == 1e-4
    assert cfg.init_k == 2
    assert cfg.spatial_scale == (-0.1, 0.3)
    assert cfg.saturation_range == (0.5, 1.1)
    assert cfg.img_gamma == (0.8, 1.2)
    assert cfg.frame_parallel_backward is True
    assert cfg.frame_inline_backward is True
    m = cfg.model
    assert m.init_thres == 0.6
    assert m.corr_levels == 3
    assert m.corr_radius == 5
    assert m.n_downsample == 3
    assert m.n_gru_layers == 3
    assert m.hidden_dims == (96, 96, 96)
    assert m.context_dims == (96, 96, 96)  # one flag feeds both, as reference
    assert m.context_norm == "batch"
    assert m.shared_backbone is False
    assert m.slow_fast_gru is True
    assert m.mixed_precision is False

    # --single_frame: reference "without --temporal"
    args2 = cli.parse_args(["--recipe", "sceneflow", "--single_frame"])
    cfg2 = cli.build_config(args2)
    assert cfg2.temporal is False and cfg2.frame_length == 1

    # no flags: the recipe passes through untouched
    args3 = cli.parse_args(["--recipe", "kitti_raw"])
    cfg3 = cli.build_config(args3)
    from tcs_tpu.config import RECIPES

    assert cfg3 == RECIPES["kitti_raw"]()


def test_eval_cli_flag_mapping():
    cli = _load_cli("evaluate")
    args = cli.parse_args([
        "--dataset", "things",
        "--corr_levels", "3", "--corr_radius", "5", "--n_downsample", "3",
        "--n_gru_layers", "3", "--hidden_dims", "64", "80", "96",
        "--context_norm", "instance", "--no_shared_backbone",
        "--slow_fast_gru", "--no_mixed_precision",
    ])
    m = cli.build_model_config(args)
    assert m.corr_levels == 3 and m.corr_radius == 5
    assert m.n_downsample == 3 and m.n_gru_layers == 3
    assert m.hidden_dims == (64, 80, 96) and m.context_dims == (64, 80, 96)
    assert m.context_norm == "instance"
    assert m.shared_backbone is False
    assert m.slow_fast_gru is True
    assert m.mixed_precision is False

    from tcs_tpu.config import ModelConfig

    assert cli.build_model_config(cli.parse_args(["--dataset", "kitti"])) \
        == ModelConfig()


# ---------------------------------------------------------------------------
# subprocess end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cli_tartanair_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    g = np.random.default_rng(11)
    n_frames = 6
    for scene, diff, part in [("gascola", "Easy", "P001"),   # test keyword
                              ("gascola", "Easy", "P005")]:  # train
        base = root / "TartanAir" / scene / scene / diff / part
        (base / "image_left").mkdir(parents=True)
        (base / "image_right").mkdir(parents=True)
        (base / "depth_left").mkdir(parents=True)
        poses = []
        for i in range(n_frames):
            img = g.integers(0, 255, size=(120, 160, 3)).astype(np.uint8)
            Image.fromarray(img).save(base / "image_left" / f"{i:06d}_left.png")
            Image.fromarray(img).save(
                base / "image_right" / f"{i:06d}_right.png")
            np.save(base / "depth_left" / f"{i:06d}_left_depth.npy",
                    g.uniform(2, 30, size=(120, 160)).astype(np.float32))
            poses.append(f"{0.1 * i} 0 0 0 0 0 1")
        (base / "pose_left.txt").write_text("\n".join(poses) + "\n")
    return str(root)


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcs_tpu_jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    return env


def test_train_and_evaluate_cli_end_to_end(cli_tartanair_tree, tmp_path):
    """scripts/train.py --recipe TartanAir for 2 steps on a fabricated tree
    (completes, checkpoint appears), then scripts/evaluate.py restores that
    checkpoint and streams the test sequence (finite metrics printed).
    Compile-heavy on the 2-core CPU host (~3-4 min cold, cached after)."""
    ckpt_dir = str(tmp_path / "ckpts")
    r = subprocess.run(
        [sys.executable, "scripts/train.py", "--recipe", "TartanAir",
         "--data_root", cli_tartanair_tree, "--checkpoint_dir", ckpt_dir,
         "--name", "cli_smoke", "--num_steps", "2", "--batch_size", "1",
         "--frame_length", "2", "--train_iters", "2", "--image_size", "64",
         "96", "--num_workers", "1", "--lr", "1e-4"],
        cwd=REPO, env=_cli_env(), capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    # the final collective save leaves an Orbax step dir under name/
    from tcs_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(osp.join(ckpt_dir, "cli_smoke"))
    assert mgr.latest_step() == 2
    # (the metrics jsonl flushes on the sum_freq=100 cadence, so a 2-step
    # run does not create it — no assertion on it here)

    r2 = subprocess.run(
        [sys.executable, "scripts/evaluate.py", "--dataset", "TartanAir",
         "--restore_ckpt", osp.join(ckpt_dir, "cli_smoke"),
         "--data_root", cli_tartanair_tree, "--valid_iters", "1",
         "--max_sequences", "1"],
        cwd=REPO, env=_cli_env(), capture_output=True, text=True,
        timeout=900)
    assert r2.returncode == 0, f"stdout:\n{r2.stdout}\nstderr:\n{r2.stderr}"
    assert "Loaded checkpoint" in r2.stdout
    out = r2.stdout + r2.stderr
    assert "TartanAir-epe" in out  # metrics reached the log
