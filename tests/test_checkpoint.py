"""Checkpoint IO tests: native params npz round trip, orbax train-state
round trip, and config corpus translation."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_params_npz_roundtrip(tmp_path):
    from vidtok_tpu.utils.checkpoint import load_params, save_params

    params = {"encoder": {"conv_in": {"kernel": jnp.ones((3, 3, 3, 3, 8)),
                                      "bias": jnp.zeros((8,))}},
              "logvar": jnp.float32(0.5)}
    path = str(tmp_path / "p.npz")
    save_params(path, params)
    loaded = load_params(path)
    np.testing.assert_array_equal(loaded["encoder"]["conv_in"]["kernel"],
                                  params["encoder"]["conv_in"]["kernel"])
    assert float(loaded["logvar"]) == 0.5


def test_orbax_train_state_roundtrip(tmp_path):
    from vidtok_tpu.train.state import TrainState, make_optimizer
    from vidtok_tpu.utils.checkpoint import (latest_checkpoint,
                                             restore_train_state,
                                             save_train_state)

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    opt = make_optimizer(1e-3)
    state = TrainState(
        step=jnp.int32(7), params_g=params, params_d=params,
        batch_stats_d={}, opt_state_g=opt.init(params),
        opt_state_d=opt.init(params), lecam_ema_real=jnp.float32(0.1),
        lecam_ema_fake=jnp.float32(-0.1), ema_params=None)
    ckdir = str(tmp_path / "ck")
    save_train_state(ckdir, state, 7)
    path, step = latest_checkpoint(ckdir)
    assert step == 7
    restored = restore_train_state(path, jax.device_get(state))
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params_g["w"]),
                                  np.asarray(params["w"]))
    assert float(restored.lecam_ema_real) == pytest.approx(0.1)


def test_checkpoint_pruning(tmp_path):
    from vidtok_tpu.train.state import TrainState, make_optimizer
    from vidtok_tpu.utils.checkpoint import (all_checkpoint_steps,
                                             save_train_state)

    params = {"w": jnp.zeros((2,))}
    opt = make_optimizer(1e-3)
    state = TrainState(
        step=jnp.int32(0), params_g=params, params_d=params,
        batch_stats_d={}, opt_state_g=opt.init(params),
        opt_state_d=opt.init(params), lecam_ema_real=jnp.float32(0),
        lecam_ema_fake=jnp.float32(0), ema_params=None)
    ckdir = str(tmp_path / "ck")
    for s in (1, 2, 3, 4, 5):
        save_train_state(ckdir, state, s, keep=3)
    assert sorted(all_checkpoint_steps(ckdir)) == [3, 4, 5]


def _tiny_state():
    from vidtok_tpu.train.state import TrainState, make_optimizer

    params = {"w": jnp.zeros((2,))}
    opt = make_optimizer(1e-3)
    return TrainState(
        step=jnp.int32(0), params_g=params, params_d=params,
        batch_stats_d={}, opt_state_g=opt.init(params),
        opt_state_d=opt.init(params), lecam_ema_real=jnp.float32(0),
        lecam_ema_fake=jnp.float32(0), ema_params=None)


def test_monitor_checkpoint_retention(tmp_path):
    """Top-k-by-monitor + save_last (reference ModelCheckpoint with
    monitor='val/rec_loss', save_top_k=3, main.py:861-880)."""
    from vidtok_tpu.utils.checkpoint import (all_checkpoint_steps,
                                             best_checkpoint,
                                             save_train_state)

    state = _tiny_state()
    ckdir = str(tmp_path / "ck")
    # monitor values: best at steps 30 (0.1), 10 (0.2), 50 (0.3)
    for s, v in ((10, 0.2), (20, 0.5), (30, 0.1), (40, 0.4), (50, 0.3)):
        save_train_state(ckdir, state, s, keep=3, monitor_value=v)
    assert sorted(all_checkpoint_steps(ckdir)) == [10, 30, 50]
    path, step = best_checkpoint(ckdir)
    assert step == 30 and path.endswith("step_00000030")

    # a later monitor-less periodic save is retained as "last" alongside
    # the top-3-by-monitor set
    save_train_state(ckdir, state, 60, keep=3)
    assert sorted(all_checkpoint_steps(ckdir)) == [10, 30, 50, 60]
    # the next periodic save rolls the previous "last" away
    save_train_state(ckdir, state, 70, keep=3)
    assert sorted(all_checkpoint_steps(ckdir)) == [10, 30, 50, 70]
    # a new best displaces the worst of the top-3 (50 @ 0.3)
    save_train_state(ckdir, state, 80, keep=3, monitor_value=0.05)
    assert sorted(all_checkpoint_steps(ckdir)) == [10, 30, 80]
    path, step = best_checkpoint(ckdir)
    assert step == 80


def test_all_configs_translate():
    """Every shipped config builds a core + trainer-visible loss config."""
    from vidtok_tpu.config import load_config
    from vidtok_tpu.models.autoencoder import build_core_from_config
    from vidtok_tpu.train.losses import LossConfig

    cfgs = sorted(glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml"),
                            recursive=True))
    assert len(cfgs) >= 23
    for path in cfgs:
        if "vidtwin" in path:
            from vidtok_tpu.models.vidtwin import build_vidtwin_from_config

            model, meta = build_vidtwin_from_config(load_config(path)["model"])
            assert meta["kind"] == "vidtwin"
            continue
        cfg = load_config(path)
        core, meta = build_core_from_config(cfg["model"])
        assert core.encoder.ch == 128
        lc = LossConfig.from_dict(
            cfg["model"]["params"]["loss_config"]["params"])
        assert lc.disc_start == 20001
        if "fsq" in os.path.basename(path):
            assert meta["discrete"]
        if "v1_1" in os.path.basename(path):
            assert meta["variant"] == "causal_v1_1"
            assert core.decoder.interpolation_mode == "trilinear"
        if "noncausal" in os.path.basename(path):
            assert not meta["is_causal"]
        if "_288_" in os.path.basename(path):
            assert meta["time_downsample_factor"] == 2
        if "_888_" in os.path.basename(path):
            assert meta["time_downsample_factor"] == 8


def test_torch_ckpt_end_to_end(tmp_path):
    """Saving a torch-style .ckpt and loading it through the public API
    reproduces golden outputs (the released-HF-checkpoint path)."""
    import torch

    from tests.golden_utils import load_golden
    from tests.test_parity import small_cfg
    from vidtok_tpu import load_model_from_config

    sd, arrays = load_golden("causal_v1_kl")
    state = {k: torch.tensor(v) for k, v in sd.items()}
    path = str(tmp_path / "model.ckpt")
    torch.save({"state_dict": state}, path)

    cfg = {"model": {"params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": small_cfg()},
        "decoder_config": {"target": "DecoderCausal3D", "params": small_cfg()},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
        "ignore_keys": []}}}
    tok = load_model_from_config(cfg, ckpt=path)
    z, dec, log = tok(jnp.asarray(arrays["x"]))
    np.testing.assert_allclose(np.asarray(dec), arrays["dec"], atol=2e-4,
                               rtol=2e-3)


def test_convert_full_ckpt_cli(tmp_path):
    """One-command released-checkpoint conversion (tools/convert_ckpt.py):
    a full Lightning-layout .ckpt (core + loss.logvar + discriminator +
    LitEma shadows, reference autoencoder.py:69-117 key layout) converts to
    a sectioned .npz whose core section loads through the public API
    identically to loading the .ckpt directly, and whose EMA/disc/logvar
    sections round-trip with correct structure."""
    import subprocess
    import sys

    import torch

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # drop axon sitecustomize: force CPU

    from tests.golden_utils import load_golden
    from vidtok_tpu import load_model_from_config
    from vidtok_tpu.utils.checkpoint import load_full_npz

    sd, _ = load_golden("full_ckpt")
    state = {k: torch.tensor(v) for k, v in sd.items()}
    ckpt = str(tmp_path / "released.ckpt")
    torch.save({"state_dict": state, "global_step": 12345}, ckpt)

    out = str(tmp_path / "released.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "convert_ckpt.py"),
         ckpt, out],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out)

    sections = load_full_npz(out)
    for key in ("core", "logvar", "disc_params", "disc_stats", "ema_core",
                "ema_num_updates"):
        assert key in sections, f"missing section {key} (have {sorted(sections)})"
    assert sections["ema_num_updates"] == 2

    # EMA shadows: same tree as core, numerically different (EMA advanced)
    assert (jax.tree_util.tree_structure(sections["ema_core"])
            == jax.tree_util.tree_structure(sections["core"]))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))),
        sections["core"], sections["ema_core"])
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6

    # the golden's generator used ch_mult [1,2], tdf 2 (gen_goldens.gen_full_ckpt)
    p = dict(double_z=True, z_channels=4, in_channels=3, out_ch=3, ch=32,
             ch_mult=[1, 2], time_downsample_factor=2, num_res_blocks=1,
             dropout=0.0, norm_type="layernorm", tempo_ds=[0], tempo_us=[1])
    cfg = {"model": {"params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": dict(p)},
        "decoder_config": {"target": "DecoderCausal3D", "params": dict(p)},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
        "ignore_keys": []}}}

    x = jnp.asarray(np.random.RandomState(7)
                    .randn(1, 3, 5, 16, 16).astype("float32") * 0.5)
    tok_ckpt = load_model_from_config(cfg, ckpt=ckpt)
    tok_npz = load_model_from_config(cfg, ckpt=out)
    _, dec_a, _ = tok_ckpt(x)
    _, dec_b, _ = tok_npz(x)
    np.testing.assert_array_equal(np.asarray(dec_a), np.asarray(dec_b))
