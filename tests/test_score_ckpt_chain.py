"""End-to-end test of the released-checkpoint scoring chain
(``tools/score_released_ckpt.sh``) minus the download: fabricate a
reference-format ``.pth`` at random init, convert it, load it into the model
and run one forward — exactly what the script does in --fabricate mode.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_score_ckpt_chain_fabricated(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # Run in a scratch cwd so checkpoints/ artifacts never pollute the repo;
    # the script cd's to the repo root itself, so patch HOME-free paths via
    # an absolute --pth inside tmp_path and convert output under the repo's
    # checkpoints/ is avoided by invoking the python stages directly.
    pth = tmp_path / "fabricated.pth"
    out = tmp_path / "fabricated_jax"

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/fabricate_ref_ckpt.py"),
         "--out", str(pth)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert pth.exists()

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convert_torch_ckpt.py"),
         "--pth", str(pth), "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "converted 16735005 params" in r.stdout, r.stdout

    # load + forward smoke (same snippet the script runs)
    import jax
    import jax.numpy as jnp

    from tcs_tpu.config import ModelConfig
    from tcs_tpu.models import CameraParams, TCStereo, TemporalState
    from tcs_tpu.utils.checkpoint import load_params

    cfg = ModelConfig(mixed_precision=False, corr_dtype="float32")
    model = TCStereo(cfg=cfg)
    B, H, W = 1, 64, 96
    state = TemporalState.zeros(B, H, W, cfg)
    cam = CameraParams(
        K=jnp.asarray([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]]),
        baseline=jnp.ones((1,)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((B, H, W, 3)),
                        jnp.zeros((B, H, W, 3)), state, cam,
                        jnp.eye(4)[None], iters=1, test_mode=True)
    ref_leaves = jax.tree_util.tree_leaves(params)
    params = load_params(str(out), params)
    new_leaves = jax.tree_util.tree_leaves(params)
    # restored tree must differ from the fresh init (weights actually loaded)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(ref_leaves, new_leaves)
    )
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    outp = model.apply(params, i1, i2, state, cam, jnp.eye(4)[None],
                       iters=2, test_mode=True)
    flow = np.asarray(outp.flow)
    assert flow.shape == (B, H, W, 1)
    assert np.isfinite(flow).all()
    assert (flow <= 0).all()
