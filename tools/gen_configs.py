"""Emit the full config corpus (the 23 VidTok model variants) into configs/.

Mirrors the reference's variation axes (SURVEY.md §2.3): regularizer
(KL channels / FSQ levels), causality (v1.0 causal / non-causal / v1.1
causal), and VCR (2x8x8, 4x4x4, 4x8x8, 4x16x16, 8x8x8). The YAML shape is
target:/params: so reference configs also load 1:1 through the registry
aliases. Run:  python tools/gen_configs.py
"""

import os

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "configs")

TRAIN_RECIPE = dict(
    base_learning_rate=1.0e-5,
    loss_config={
        "target": "GeneralLPIPSWithDiscriminator",
        "params": dict(
            dims=3, perceptual_weight=1.0, disc_start=20001, disc_weight=0.2,
            disc_type="2d", learn_logvar=True, gen_loss_cross_entropy=True,
            lecam_loss_weight=0.005,
            regularization_weights={"aux_loss": 1.0, "kl_loss": 1.0e-6},
        ),
    },
)


def vcr_params(vcr: str):
    """Video-compression-ratio string (e.g. '488' = 4x8x8 t,h,w) ->
    encoder/decoder topology params."""
    if vcr == "488":
        return dict(ch_mult=[1, 2, 4, 4], time_downsample_factor=4)
    if vcr == "41616":
        return dict(ch_mult=[1, 2, 4, 4, 4], time_downsample_factor=4)
    if vcr == "288":
        return dict(ch_mult=[1, 2, 4, 4], tempo_ds=[1], tempo_us=[2],
                    time_downsample_factor=2)
    if vcr == "444":
        return dict(ch_mult=[1, 2, 4, 4], spatial_ds=[1, 2], spatial_us=[1, 2],
                    time_downsample_factor=4)
    if vcr == "888":
        return dict(ch_mult=[1, 2, 4, 4], tempo_ds=[0, 1, 2],
                    tempo_us=[1, 2, 3], time_downsample_factor=8)
    raise ValueError(vcr)


FSQ_LEVELS = {4096: [8] * 4, 32768: [8] * 5, 262144: [8] * 6}


def make_config(kind, causality, vcr, chn_or_codes, v1_1=False):
    enc_target = {
        ("causal", False): "EncoderCausal3D",
        ("causal", True): "EncoderCausal3DV1_1",
        ("noncausal", False): "Encoder3D",
    }[(causality, v1_1)]
    dec_target = enc_target.replace("Encoder", "Decoder")

    ep = dict(
        double_z=kind == "kl",
        z_channels=chn_or_codes if kind == "kl" else len(FSQ_LEVELS[chn_or_codes]),
        in_channels=3, out_ch=3, ch=128, num_res_blocks=2, dropout=0.0,
        use_checkpoint=False, norm_type="layernorm",
    )
    ep.update(vcr_params(vcr))
    if causality == "causal":
        ep["init_pad_mode"] = "replicate"
    if v1_1:
        ep["interpolation_mode"] = "trilinear"

    if kind == "kl":
        reg = {"target": "DiagonalGaussianRegularizer"}
    else:
        reg = {"target": "FSQRegularizer", "params": dict(
            levels=FSQ_LEVELS[chn_or_codes], entropy_loss_weight=0.1,
            entropy_loss_annealing_steps=2000, entropy_loss_annealing_factor=3,
            commitment_loss_weight=0.25,
        )}

    params = dict(
        monitor="val/rec_loss",
        encoder_config={"target": enc_target, "params": ep},
        decoder_config={"target": dec_target,
                        "params": "${model.params.encoder_config.params}"},
        regularizer_config=reg,
        loss_config=TRAIN_RECIPE["loss_config"],
    )
    if v1_1:
        params["use_tiling"] = False
        params["t_chunk_enc"] = 16

    frames = 33 if v1_1 else (17 if causality == "causal" else 16)
    cfg = dict(
        model=dict(
            base_learning_rate=TRAIN_RECIPE["base_learning_rate"],
            target="AutoencodingEngineV1_1" if v1_1 else "AutoencodingEngine",
            params=params,
        ),
        data=dict(
            target="DataModuleFromConfig",
            params=dict(
                batch_size=2, num_workers=4,
                train={"target": "VidTokDataset", "params": dict(
                    data_dir="DATA_DIR", meta_path="META_PATH",
                    video_params=dict(input_height=256, input_width=256,
                                      sample_num_frames=frames, sample_fps=3),
                )},
                validation={"target": "VidTokDataset", "params": dict(
                    data_dir="DATA_DIR", meta_path="META_PATH",
                    video_params=dict(input_height=256, input_width=256,
                                      sample_num_frames=frames, sample_fps=8),
                    start_index=0,
                )},
            ),
        ),
        training=dict(
            precision="bf16-mixed", max_steps=50000, val_check_interval=2000,
            checkpoint_every=5000, log_images_every=5000, grad_clip=20.0,
            seed=23,
            # activation remat: required to fit the flagship 17x256x256 GAN
            # step on one 16 GB v5e (needs 25.6 G unrematted — BENCH_NOTES
            # round-5 HBM matrix); training-only, never touches inference
            use_checkpoint=True,
        ),
    )
    return cfg


def main():
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(os.path.join(OUT, "v1_1"), exist_ok=True)
    names = []

    v10 = [
        ("kl", "causal", "488", 4), ("kl", "causal", "488", 8),
        ("kl", "causal", "488", 16), ("kl", "causal", "288", 8),
        ("kl", "causal", "444", 4), ("kl", "causal", "41616", 4),
        ("kl", "noncausal", "488", 4), ("kl", "noncausal", "488", 16),
        ("kl", "noncausal", "41616", 4), ("kl", "noncausal", "41616", 16),
        ("fsq", "causal", "488", 262144), ("fsq", "causal", "488", 32768),
        ("fsq", "causal", "488", 4096), ("fsq", "causal", "41616", 262144),
        ("fsq", "noncausal", "488", 262144), ("fsq", "noncausal", "41616", 262144),
    ]
    for kind, caus, vcr, n in v10:
        suffix = f"{n}chn" if kind == "kl" else str(n)
        name = f"vidtok_{kind}_{caus}_{vcr}_{suffix}"
        cfg = make_config(kind, caus, vcr, n)
        with open(os.path.join(OUT, f"{name}.yaml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        names.append(name)

    v11 = [
        ("kl", "488", 4), ("kl", "488", 16), ("kl", "41616", 16),
        ("kl", "288", 8), ("fsq", "488", 32768), ("fsq", "888", 32768),
        ("fsq", "41616", 262144),
    ]
    for kind, vcr, n in v11:
        suffix = f"{n}chn" if kind == "kl" else str(n)
        name = f"vidtok_{kind}_causal_{vcr}_{suffix}_v1_1"
        cfg = make_config(kind, "causal", vcr, n, v1_1=True)
        with open(os.path.join(OUT, "v1_1", f"{name}.yaml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        names.append(name)

    print(f"wrote {len(names)} configs")


if __name__ == "__main__":
    main()
