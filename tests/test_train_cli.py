"""scripts/train.py end-to-end: train a few steps, checkpoint, auto-resume."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest
import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_TRAIN = {
    "model": {"base_learning_rate": 1e-4, "params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": {
            "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
            "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
            "num_res_blocks": 1, "norm_type": "layernorm",
            "tempo_ds": [0], "tempo_us": [1]}},
        "decoder_config": {"target": "DecoderCausal3D",
                           "params": "${model.params.encoder_config.params}"},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
        "loss_config": {"target": "GeneralLPIPSWithDiscriminator", "params": {
            "dims": 3, "perceptual_weight": 0.0, "disc_start": 1000000,
            "disc_type": "2d", "learn_logvar": False,
            "regularization_weights": {"kl_loss": 1e-6}}},
    }},
    "data": {"target": "DataModuleFromConfig", "params": {
        "batch_size": 2, "num_workers": 2,
        "train": {"target": "VidTokDataset", "params": {
            "data_dir": None, "meta_path": None,
            "video_params": {"input_height": 32, "input_width": 32,
                             "sample_num_frames": 5, "sample_fps": 30}}},
    }},
    "training": {"max_steps": 3, "val_check_interval": 0,
                 "checkpoint_every": 3, "log_images_every": 100000},
}


@pytest.mark.slow
def test_train_cli_and_resume(tmp_path):
    from vidtok_tpu.data.video_reader import write_video

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    frames = (rng.rand(30, 32, 32, 3) * 255).astype(np.uint8)
    write_video(str(data_dir / "a.mp4"), frames, fps=30)
    write_video(str(data_dir / "b.mp4"), frames, fps=30)
    with open(data_dir / "meta.csv", "w") as f:
        f.write("videos\na.mp4\nb.mp4\n")

    cfg = yaml.safe_load(yaml.safe_dump(TINY_TRAIN))
    tp = cfg["data"]["params"]["train"]["params"]
    tp["data_dir"] = str(data_dir)
    tp["meta_path"] = str(data_dir / "meta.csv")
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    logdir = str(tmp_path / "logs")

    def run(extra):
        r = subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts", "train.py"),
             "-b", str(cfg_path), "-l", logdir, "-n", "tiny"] + extra,
            cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200)
        assert r.returncode == 0, r.stdout[-3000:] + "\n" + r.stderr[-3000:]
        return r.stdout

    out1 = run([])
    assert "checkpoint ->" in out1

    # resume: continues from step 3 to 5
    out2 = run(["--resume", "--max_steps", "5"])
    assert re.search(r"resuming from .*step_00000003", out2), out2[-2000:]
    assert "checkpoint ->" in out2
