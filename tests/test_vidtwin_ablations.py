"""VidTwin ablation-ladder parity vs the torch reference (golden fixtures)
+ GroupAttention/DropPath semantics + LR-schedule step parity.

Reference classes: vidtwin/models/vidtwin_ae.py:282-1216 (Qformer, Compact,
Sym, SymVid), st_transformer.py:142-212 (GroupAttention), :1504-1567
(LR schedulers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.golden_utils import load_golden
from vidtok_tpu.models.vidtwin import build_vidtwin_from_config
from vidtok_tpu.models.vidtwin.convert import (
    convert_vidtwin_ablation_state_dict, convert_vidtwin_state_dict)

TOL = dict(atol=3e-4, rtol=3e-3)


def _stt_cfg(which):
    return {"target": which, "params": {
        "in_channels": 3, "input_size": [4, 32, 32], "patch_size": [1, 8, 8],
        "hidden_size": 64, "depth": 2, "num_heads": 4,
        "temporal_casual": False}}


def _q_cfg(tokens, qh=32):
    return {"target": "q", "params": {
        "num_query_tokens": tokens, "query_hidden_size": qh,
        "encoder_hidden_size": 64}}


def _build(target, **params):
    cfg = {"target": target, "params": {
        "encoder_config": _stt_cfg("e"), "decoder_config": _stt_cfg("d"),
        "regularizer_config": {"target": "DiagonalGaussianRegularizer",
                               "params": {"sample": False}},
        **params}}
    model, meta = build_vidtwin_from_config(cfg)
    assert meta["kind"] == "vidtwin"
    # strict parity: fp32 attention (the oracle is cast-neutralized)
    return model.clone(encoder=model.encoder.clone(attn_dtype=None),
                       decoder=model.decoder.clone(attn_dtype=None))


def to_nthwc(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))


def to_ncthw(x):
    return np.transpose(np.asarray(x), (0, 4, 1, 2, 3))


def _check(model, golden_name, n_latents, converter=None,
           allowed_unexpected=()):
    sd, arrays = load_golden(golden_name)
    params = (converter or convert_vidtwin_ablation_state_dict)(sd)
    x = to_nthwc(arrays["x"])
    ref_tree = model.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(0)}, x)["params"]
    from vidtok_tpu.utils.checkpoint import validate_params

    missing, unexpected, mismatched = validate_params(params, ref_tree)
    assert not missing, missing[:8]
    unexpected = [u for u in unexpected if u not in allowed_unexpected]
    assert not unexpected, unexpected[:8]
    assert not mismatched, mismatched[:8]
    params = jax.tree_util.tree_map(jnp.asarray, params)

    out = model.apply({"params": params}, x, sample_override=False,
                      rngs={"sample": jax.random.PRNGKey(0)})
    dec, lat = out[1], out[-1]
    assert len(lat) == n_latents
    for i, l in enumerate(lat):
        np.testing.assert_allclose(np.asarray(l), arrays[f"lat{i}"],
                                   err_msg=f"lat{i}", **TOL)
    np.testing.assert_allclose(to_ncthw(dec), arrays["dec"], **TOL)


def test_qformer_ablation_parity():
    _check(_build("VidAutoEncoderQformer",
                  temporal_qformer_config=_q_cfg(4),
                  height_qformer_config=_q_cfg(2),
                  width_qformer_config=_q_cfg(2)),
           "vidtwin_abl_qformer", 3)


def test_compact_ablation_parity():
    _check(_build("VidAutoEncoderQformerCompact",
                  temporal_qformer_config=_q_cfg(4),
                  space_qformer_config=_q_cfg(3),
                  temporal_down_dim=8, retain_num_frames=True,
                  repeat_for_decoder=False),
           "vidtwin_abl_compact", 2)


def test_compact_alt_ablation_parity():
    """retain_num_frames=False + repeat_for_decoder=True head variants.
    (The reference creates up_channel_temp unconditionally (:541) but never
    uses it with repeat_for_decoder=True — tolerated as unexpected.)"""
    _check(_build("VidAutoEncoderQformerCompact",
                  temporal_qformer_config=_q_cfg(4),
                  space_qformer_config=_q_cfg(3),
                  temporal_down_dim=8, retain_num_frames=False,
                  repeat_for_decoder=True),
           "vidtwin_abl_compact_alt", 2,
           allowed_unexpected=("/up_channel_temp",))


def test_sym_ablation_parity():
    _check(_build("VidAutoEncoderQformerCompactSym",
                  temporal_qformer_config=_q_cfg(4),
                  space_qformer_config=_q_cfg(3),
                  init_ch=16, cont_num_blocks=1, expect_ch=8,
                  retain_num_frames=True),
           "vidtwin_abl_sym", 2)


def test_symvid_ablation_parity():
    """SymVid (non-VAE): VidTwinVAE with vae=False; deterministic latents,
    zero KL (reference :1178-1208)."""
    model = _build("VidAutoEncoderQformerCompactSymVid",
                   temporal_qformer_config=_q_cfg(4),
                   expect_ch=8, cont_num_blocks=1, downsample_motion=True,
                   motion_num_blocks=1, d_dim=8, init_ch=16)
    assert not model.vae
    sd, arrays = load_golden("vidtwin_abl_symvid")
    params = jax.tree_util.tree_map(jnp.asarray,
                                    convert_vidtwin_state_dict(sd))
    x = to_nthwc(arrays["x"])
    z, dec, reg_log, lat = model.apply(
        {"params": params}, x, rngs={"sample": jax.random.PRNGKey(0)})
    assert float(reg_log["kl_loss"]) == 0.0
    for i, l in enumerate(lat):
        np.testing.assert_allclose(np.asarray(l), arrays[f"lat{i}"],
                                   err_msg=f"lat{i}", **TOL)
    np.testing.assert_allclose(to_ncthw(dec), arrays["dec"], **TOL)


def test_symdis_shuffles_content_only():
    """SymDis: the content pathway sees shuffled frames, motion the
    originals (reference :940-965). With shuffle_ratio=1 and a constant-
    frame input, outputs must equal the unshuffled Sym forward."""
    model = _build("VidAutoEncoderQformerCompactSymDis",
                   temporal_qformer_config=_q_cfg(4),
                   space_qformer_config=_q_cfg(3),
                   init_ch=16, cont_num_blocks=1, expect_ch=8,
                   shuffle_content_ratio=1.0)
    assert model.dis
    frame = np.random.RandomState(0).randn(1, 1, 32, 32, 3)
    x = jnp.asarray(np.repeat(frame, 4, axis=1), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "sample": jax.random.PRNGKey(0)}, x)
    z, dec, reg_log, (u_c, u_m) = model.apply(
        v, x, rngs={"sample": jax.random.PRNGKey(1)})
    base = model.clone(dis=False)
    z2, dec2, _, (u_c2, u_m2) = base.apply(
        v, x, rngs={"sample": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_c2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(u_m), np.asarray(u_m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec2), atol=1e-4)


def test_group_attention_is_blockwise():
    """GroupAttention == full Attention run independently per group (the
    reference flash path's semantics, st_transformer.py:184-200)."""
    from vidtok_tpu.models.vidtwin.st_transformer import (Attention,
                                                          GroupAttention)

    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 32), jnp.float32)
    ga = GroupAttention(dim=32, num_heads=4, group_size=4, attn_dtype=None)
    v = ga.init(jax.random.PRNGKey(0), x)
    for causal in (False, True):
        out = ga.apply(v, x, causal=causal)
        fa = Attention(dim=32, num_heads=4, attn_dtype=None)
        ref = fa.apply(v, x.reshape(4, 4, 32), causal=causal).reshape(2, 8, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_drop_path_identity_and_scaling():
    from vidtok_tpu.models.vidtwin.st_transformer import drop_path

    x = jnp.ones((64, 3, 5))
    assert drop_path(x, 0.0, False, jax.random.PRNGKey(0)) is x
    assert drop_path(x, 0.5, True, jax.random.PRNGKey(0)) is x
    y = np.asarray(drop_path(x, 0.5, False, jax.random.PRNGKey(0)))
    # per-sample: each row is either all 0 or all 1/keep
    per = y.reshape(64, -1)
    assert set(np.unique(per)) <= {0.0, 2.0}
    assert (per.std(axis=1) == 0).all()
    assert 0 < per.max()


def test_lr_schedule_parity():
    """Our optax schedules reproduce the reference torch schedulers step for
    step (reference vidtwin_ae.py:1504-1567 + HF inverse_sqrt)."""
    from vidtok_tpu.models.vidtwin import schedules

    _, arrays = load_golden("lr_schedules")
    n = len(arrays["linear"])
    steps = np.arange(n)

    ours = {
        # the reference LinearWarmupScheduler never uses its target_lr arg —
        # lr scales the optimizer base_lr (1.0 in the trace)
        "linear": schedules.linear_warmup(1.0, 20, 200),
        "constant": schedules.constant_warmup(1.0, 20),
        "cosine": schedules.lambda_warmup_cosine(1e-6, 2e-4, 1e-8, 25, 200),
        "cosine_rate": schedules.lambda_warmup_cosine(0.0, 1e-4, 0.0,
                                                      int(200 * 0.1), 200),
        "inverse_sqrt": schedules.inverse_sqrt(1.0, 30),
    }
    for name, sched in ours.items():
        if name not in arrays:
            continue
        got = np.asarray([float(sched(s)) for s in steps])
        np.testing.assert_allclose(got, arrays[name], rtol=1e-5, atol=1e-9,
                                   err_msg=name)
