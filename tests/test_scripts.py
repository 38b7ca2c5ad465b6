"""End-to-end CLI tests on synthetic videos (CPU, tiny model)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_MODEL = {
    "model": {"base_learning_rate": 1e-4, "params": {
        "encoder_config": {"target": "EncoderCausal3DV1_1", "params": {
            "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
            "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
            "num_res_blocks": 1, "norm_type": "layernorm",
            "interpolation_mode": "trilinear",
            "tempo_ds": [0], "tempo_us": [1]}},
        "decoder_config": {"target": "DecoderCausal3DV1_1",
                           "params": "${model.params.encoder_config.params}"},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
        "loss_config": {"target": "GeneralLPIPSWithDiscriminator", "params": {
            "dims": 3, "perceptual_weight": 1.0, "disc_start": 0,
            "disc_weight": 0.2, "disc_type": "2d", "learn_logvar": True,
            "gen_loss_cross_entropy": True, "lecam_loss_weight": 0.005,
            "regularization_weights": {"kl_loss": 1e-6}}},
    }}}


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    from vidtok_tpu.data.video_reader import write_video

    rng = np.random.RandomState(0)
    # smooth-ish video so reconstruction PSNR is meaningful
    base = rng.rand(1, 48, 64, 3)
    frames = np.clip(base + 0.02 * rng.randn(40, 48, 64, 3), 0, 1)
    write_video(str(d / "clip.mp4"), (frames * 255).astype(np.uint8), fps=30)
    with open(d / "tiny.yaml", "w") as f:
        yaml.safe_dump(TINY_MODEL, f)
    return str(d)


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop axon sitecustomize: force CPU
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    return r.stdout


def test_inference_reconstruct_cli(workdir):
    out = _run([os.path.join(ROOT, "scripts", "inference_reconstruct.py"),
                "--config", os.path.join(workdir, "tiny.yaml"),
                "--input_video_path", os.path.join(workdir, "clip.mp4"),
                "--input_height", "32", "--input_width", "32",
                "--chunk_size", "8", "--output_video_dir", workdir],
               cwd=ROOT)
    assert "wrote" in out
    assert os.path.exists(os.path.join(workdir, "clip_recon.mp4"))


def test_inference_reconstruct_cli_long_video(workdir):
    out = _run([os.path.join(ROOT, "scripts", "inference_reconstruct.py"),
                "--config", os.path.join(workdir, "tiny.yaml"),
                "--input_video_path", os.path.join(workdir, "clip.mp4"),
                "--input_height", "32", "--input_width", "32",
                "--chunk_size", "8", "--read_long_video",
                "--output_video_dir", workdir],
               cwd=ROOT)
    assert "wrote" in out


def test_inference_evaluate_cli(workdir):
    out = _run([os.path.join(ROOT, "scripts", "inference_evaluate.py"),
                "--config", os.path.join(workdir, "tiny.yaml"),
                "--data_dir", workdir,
                "--input_height", "32", "--input_width", "32",
                "--num_frames", "9"],
               cwd=ROOT)
    assert "mean PSNR" in out


TINY_NONCAUSAL = {
    "model": {"params": {
        "encoder_config": {"target": "Encoder3D", "params": {
            "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
            "ch": 32, "ch_mult": [1, 2, 2], "time_downsample_factor": 4,
            "num_res_blocks": 1, "norm_type": "layernorm"}},
        "decoder_config": {"target": "Decoder3D",
                           "params": "${model.params.encoder_config.params}"},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
    }}}


def test_reconstruct_example_mp4_noncausal(workdir):
    """BASELINE config #1 shape: non-causal reconstruct of the reference's
    example.mp4 (read in place; skipped when the mount is absent)."""
    example = "/root/reference/assets/example.mp4"
    if not os.path.exists(example):
        pytest.skip("reference example.mp4 not mounted")
    cfg_path = os.path.join(workdir, "tiny_noncausal.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(TINY_NONCAUSAL, f)
    out = _run([os.path.join(ROOT, "scripts", "inference_reconstruct.py"),
                "--config", cfg_path,
                "--input_video_path", example,
                "--input_height", "64", "--input_width", "64",
                "--chunk_size", "16", "--sample_fps", "30",
                "--output_video_dir", workdir],
               cwd=ROOT)
    assert "wrote" in out
    assert os.path.exists(os.path.join(workdir, "example_recon.mp4"))
