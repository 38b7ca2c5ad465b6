"""CLI e2e coverage for the remaining entry points: streaming
tokenization (scripts/stream_tokens.py) and the VidTwin
reconstruct/cross-reenact CLI (scripts/vidtwin_reconstruct.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop axon sitecustomize: force CPU
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    return r.stdout


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli2")
    from vidtok_tpu.data.video_reader import write_video

    rng = np.random.RandomState(0)
    base = rng.rand(1, 48, 64, 3)
    frames = np.clip(base + 0.02 * rng.randn(20, 48, 64, 3), 0, 1)
    write_video(str(d / "clip.mp4"), (frames * 255).astype(np.uint8), fps=30)
    return str(d)


def test_stream_tokens_cli(clip):
    from tests.test_scripts import TINY_MODEL

    cfg = os.path.join(clip, "tiny.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(TINY_MODEL, f)
    out = os.path.join(clip, "tokens.npz")
    stdout = _run([os.path.join(ROOT, "scripts", "stream_tokens.py"),
                   "--config", cfg,
                   "--input_video_path", os.path.join(clip, "clip.mp4"),
                   "--input_height", "48", "--input_width", "64",
                   "--chunk_size", "4", "--out", out], clip)
    assert os.path.exists(out), stdout
    data = np.load(out)
    assert any(k in data for k in ("z", "latents", "tokens", "indices")), \
        list(data.files)


def test_vidtwin_reconstruct_and_cross_cli(clip):
    from tests.test_vidtwin import small_cfg

    cfg_path = os.path.join(clip, "tiny_vidtwin.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"model": {"target": "VidTwinVAE", **small_cfg()}}, f)

    outdir = os.path.join(clip, "vtout")
    _run([os.path.join(ROOT, "scripts", "vidtwin_reconstruct.py"),
          "--config", cfg_path,
          "--input_video_path", os.path.join(clip, "clip.mp4"),
          "--output_video_dir", outdir], clip)
    assert os.path.exists(os.path.join(outdir, "clip_recon.mp4"))

    _run([os.path.join(ROOT, "scripts", "vidtwin_reconstruct.py"),
          "--config", cfg_path,
          "--input_video_path", os.path.join(clip, "clip.mp4"),
          "--dynamics_video_path", os.path.join(clip, "clip.mp4"),
          "--output_video_dir", outdir], clip)
    assert os.path.exists(os.path.join(outdir, "clip_cross.mp4"))


def test_vidtwin_evaluate_cli(clip):
    from tests.test_vidtwin import small_cfg

    cfg_path = os.path.join(clip, "tiny_vidtwin.yaml")
    if not os.path.exists(cfg_path):
        with open(cfg_path, "w") as f:
            yaml.safe_dump({"model": {"target": "VidTwinVAE",
                                      **small_cfg()}}, f)
    out = _run([os.path.join(ROOT, "scripts", "vidtwin_evaluate.py"),
                "--config", cfg_path, "--data_dir", clip], clip)
    assert "mean PSNR" in out and "mean SSIM" in out
