"""Training CLI (the reference's ``main.py`` harness, TPU-native).

  python scripts/train.py -b configs/vidtok_kl_causal_488_4chn.yaml \
      [--logdir logs] [--name run1] [--resume] [--max_steps N] \
      [nested.key=value ...]

Features mirrored from reference main.py:580-1124: left-to-right config
merge + CLI dotlist overrides, logdir/ckpt naming, auto-resume from the
latest checkpoint, periodic validation + checkpointing + image logging,
seeding, LR scaling. Distribution is a jax.sharding mesh (DP over 'data');
run one process per host with jax.distributed for multi-host.
"""

import argparse
import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("-b", "--base", nargs="+", required=True,
                   help="config yaml(s), merged left-to-right")
    p.add_argument("-l", "--logdir", default="logs")
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-r", "--resume", action="store_true")
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--val_every", type=int, default=None)
    p.add_argument("--ckpt_every", type=int, default=None)
    p.add_argument("--scale_lr", action="store_true",
                   help="lr = n_chips * batch_size * base_lr (reference "
                        "main.py:1025-1031)")
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 10-13")
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="explicit orbax checkpoint dir to resume from "
                        "(reference --resume_from_checkpoint)")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project", default="vidtok_tpu")
    return p


def main():
    args, unknown = get_parser().parse_known_args()
    dotlist = [a for a in unknown if "=" in a]

    import jax
    import jax.numpy as jnp

    from vidtok_tpu.config import merge_configs
    from vidtok_tpu.registry import instantiate_from_config
    from vidtok_tpu.train.trainer import VidTokTrainer
    from vidtok_tpu.utils.checkpoint import (latest_checkpoint,
                                             restore_train_state,
                                             save_train_state)
    from vidtok_tpu.utils.logging import ImageVideoLogger, MetricLogger

    cfg = merge_configs(*args.base, dotlist=dotlist)
    tcfg = cfg.get("training", {}) or {}
    max_steps = args.max_steps or tcfg.get("max_steps", 50000)
    val_every = args.val_every or tcfg.get("val_check_interval", 2000)
    ckpt_every = args.ckpt_every or tcfg.get("checkpoint_every", 5000)

    name = args.name or os.path.splitext(os.path.basename(args.base[0]))[0]
    stamp = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    if args.resume:
        runs = sorted(d for d in os.listdir(args.logdir)
                      if d.endswith(name)) if os.path.isdir(args.logdir) else []
        rundir = os.path.join(args.logdir, runs[-1]) if runs else None
    else:
        rundir = None
    if rundir is None:
        rundir = os.path.join(args.logdir, f"{stamp}_{name}")
    ckptdir = os.path.join(rundir, "checkpoints")
    os.makedirs(ckptdir, exist_ok=True)

    # data-parallel axis must divide the global batch
    from vidtok_tpu.parallel.mesh import make_mesh

    bs = int((cfg.get("data", {}).get("params", {}) or {})
             .get("batch_size", 1))
    nd = len(jax.devices())
    n_data = max(d for d in range(1, min(bs, nd) + 1) if bs % d == 0)
    if n_data < nd:
        print(f"[train] batch_size {bs} uses {n_data}/{nd} devices on the "
              f"data axis")
    trainer = VidTokTrainer(cfg, mesh=make_mesh(n_data=n_data),
                            lpips_weights=args.lpips_weights,
                            seed=args.seed)
    if not trainer.lpips_pretrained:
        print("[train] WARNING: no converted LPIPS weights found — "
              "perceptual loss uses random VGG features "
              "(run tools/convert_lpips.py).")

    # per-process data seed (reference SetupCallback seed_rank,
    # main.py:331-338)
    try:
        proc = jax.process_index()
    except Exception:
        proc = 0
    cfg.setdefault("data", {}).setdefault("params", {})["seed"] = (
        args.seed + 1000 * proc)
    data = instantiate_from_config(cfg["data"]).setup()
    train_loader = data.train_dataloader()
    val_loader = data.val_dataloader()

    if args.scale_lr:
        n_chips = trainer.mesh.devices.size
        trainer.set_lr(n_chips * data.batch_size * trainer.lr)
        print(f"[train] scaled lr to {trainer.lr}")

    # example batch for init. Params are shape-independent (convs) and
    # init_state zeroes the content anyway, so init at a REDUCED spatial
    # shape: the full 17x256x256 init graph costs an extra server-side
    # compile through the axon relay (~10 min) for nothing. Keep the
    # temporal length causal-valid (4k+1) and a 64p frame.
    first_batch = next(iter(train_loader.epoch(0)))
    x0 = first_batch["jpg"]
    tdf = int(trainer.meta.get("time_downsample_factor", 4))
    t_small = (1 + tdf) if trainer.meta.get("is_causal", True) else tdf
    t_init = min(x0.shape[1], t_small)
    h_init = min(x0.shape[2], 64)
    w_init = min(x0.shape[3], 64)
    state = trainer.init_state(x0[:, :t_init, :h_init, :w_init])

    start_step = 0
    if args.resume_from_checkpoint:
        path = args.resume_from_checkpoint
    else:
        path, _ = latest_checkpoint(ckptdir)
    if path is not None:
        print(f"[train] resuming from {path}")
        state = restore_train_state(path, jax.device_get(state))
        # the restored optimizer step is the ground truth (a path regex can
        # disagree with the state and skew max_steps/ckpt naming)
        start_step = int(jax.device_get(state.step))
    state = trainer.shard_state(state)

    # wandb resume-by-run-id (reference main.py:711-720: a resumed run
    # re-attaches to its original wandb run)
    wandb_id_file = os.path.join(rundir, "wandb_id.txt")
    wandb_run_id = None
    if (args.resume or args.resume_from_checkpoint) and os.path.exists(wandb_id_file):
        with open(wandb_id_file) as f:
            wandb_run_id = f.read().strip() or None
        if wandb_run_id:
            print(f"[train] resuming wandb run {wandb_run_id}")
    metrics = MetricLogger(
        rundir, wandb_project=args.wandb_project if args.wandb else None,
        wandb_run_id=wandb_run_id)
    if metrics.wandb_run_id:
        with open(wandb_id_file, "w") as f:
            f.write(metrics.wandb_run_id)
    img_logger = ImageVideoLogger(rundir,
                                  batch_frequency=tcfg.get("log_images_every",
                                                           5000))
    rng = jax.random.PRNGKey(args.seed)
    gstep = start_step
    t0 = time.time()
    print(f"[train] run dir {rundir}; {len(train_loader)} batches/epoch; "
          f"mesh {trainer.mesh.shape}")

    # checkpoint-on-signal / on-exception (reference melk()/SetupCallback
    # on_exception, main.py:322-329, 1038-1070)
    import signal

    def melk(*_):
        p = save_train_state(ckptdir, state, int(jax.device_get(state.step)))
        print(f"[train] emergency checkpoint -> {p}")

    try:
        signal.signal(signal.SIGUSR1, melk)
    except (ValueError, OSError):
        pass

    from vidtok_tpu.data.pipeline import device_prefetch

    def _to_device(b):
        return {**b, "jpg": trainer.shard_batch(jnp.asarray(b["jpg"]))}

    epoch = 0
    try:
        while gstep < max_steps:
            for batch in device_prefetch(train_loader.epoch(epoch),
                                         _to_device):
                rng, sub = jax.random.split(rng)
                if args.profile and gstep == start_step + 10:
                    jax.profiler.start_trace(os.path.join(rundir, "trace"))
                state, logs = trainer.fit_step(state, batch["jpg"], sub)
                if args.profile and gstep == start_step + 13:
                    jax.block_until_ready(logs)
                    jax.profiler.stop_trace()
                gstep += 1
                if gstep % 50 == 0:
                    logs = {k: float(v) for k, v in logs.items()}
                    dt = (time.time() - t0) / 50
                    t0 = time.time()
                    metrics.log_scalars(gstep,
                                        {**logs, "perf/sec_per_step": dt})
                    print(f"step {gstep}: aeloss={logs['train/aeloss']:.3f} "
                          f"discloss={logs['train/discloss']:.3f} "
                          f"({dt:.2f}s/step)")
                if img_logger.should_log(gstep):
                    z, xrec, _, _ = trainer.core.apply(
                        {"params": jax.device_get(state.params_g)["core"]},
                        batch["jpg"][: img_logger.max_samples],
                        rngs={"sample": sub},
                        method=type(trainer.core).forward_train)
                    img_logger.log(gstep,
                                   batch["jpg"][: img_logger.max_samples],
                                   np.asarray(xrec))
                if gstep % ckpt_every == 0 or gstep >= max_steps:
                    p = save_train_state(ckptdir, state, gstep)
                    print(f"[train] checkpoint -> {p}")
                if val_every and gstep % val_every == 0 and val_loader is not None:
                    monitor_val = _validate(trainer, state, val_loader,
                                            metrics, gstep)
                    # top-k-by-monitor retention (reference ModelCheckpoint
                    # monitor='val/rec_loss', main.py:861-880)
                    if monitor_val is not None and trainer.meta.get("monitor"):
                        p = save_train_state(ckptdir, state, gstep,
                                             monitor_value=monitor_val)
                        print(f"[train] monitor checkpoint "
                              f"({trainer.meta['monitor']}="
                              f"{monitor_val:.4f}) -> {p}")
                if gstep >= max_steps:
                    break
            epoch += 1
    except Exception:
        melk()
        raise
    metrics.close()
    print("[train] done")


def _validate(trainer, state, val_loader, metrics, gstep, max_batches=8):
    """Validation PSNR/SSIM + rec_loss on training weights, plus the EMA
    weights when present (reference ema_scope validation,
    autoencoder.py:300-341). Returns the non-EMA val/rec_loss (the
    ``monitor`` value, reference configs' monitor: val/rec_loss)."""
    import jax

    variants = {"": jax.device_get(state.params_g)["core"]}
    if state.ema_params is not None:
        variants["_ema"] = jax.device_get(state.ema_params[0])["core"]

    monitor = None
    for postfix, params in variants.items():
        psnr, ssim, rec = _eval_params(trainer, params, val_loader,
                                       max_batches)
        if psnr is None:
            continue
        if postfix == "":
            monitor = rec
        metrics.log_scalars(gstep, {f"val{postfix}/psnr": psnr,
                                    f"val{postfix}/ssim": ssim,
                                    f"val{postfix}/rec_loss": rec})
        print(f"[val{postfix}] step {gstep}: PSNR {psnr:.3f} "
              f"SSIM {ssim:.4f} rec_loss {rec:.4f}")
    return monitor


def _eval_params(trainer, params, val_loader, max_batches):
    import jax
    import jax.numpy as jnp

    from vidtok_tpu.ops.metrics import compute_psnr, compute_ssim
    from vidtok_tpu.train.losses import _fold_frames, perceptual_loss

    psnrs, ssims, recs = [], [], []
    for i, batch in enumerate(val_loader.epoch(0)):
        if i >= max_batches:
            break
        x = jnp.asarray(batch["jpg"])
        core = trainer.core
        z, log = core.apply({"params": params}, x, sample_override=False,
                            method=type(core).encode,
                            rngs={"sample": jax.random.PRNGKey(0)})
        xrec = core.apply({"params": params}, z, method=type(core).decode)
        if xrec.shape[1] != x.shape[1]:
            xrec = xrec[:, -x.shape[1]:]
        # val/rec_loss: L1 + perceptual (reference losses.py:174-176) — the
        # ModelCheckpoint monitor value
        rec = jnp.abs(_fold_frames(x) - _fold_frames(xrec))
        if trainer.loss_cfg.perceptual_weight > 0:
            rec = rec + trainer.loss_cfg.perceptual_weight * perceptual_loss(
                trainer.lpips, trainer.lpips_params,
                _fold_frames(x), _fold_frames(xrec))
        recs.append(float(jnp.mean(rec)))
        a = (np.asarray(x) + 1) / 2
        b = (np.clip(np.asarray(xrec), -1, 1) + 1) / 2
        # metrics expect NCTHW
        a = np.transpose(a, (0, 4, 1, 2, 3))
        b = np.transpose(b, (0, 4, 1, 2, 3))
        psnrs.append(float(compute_psnr(a, b)))
        ssims.append(float(compute_ssim(a, b)))
    if not psnrs:
        return None, None, None
    return float(np.mean(psnrs)), float(np.mean(ssims)), float(np.mean(recs))


if __name__ == "__main__":
    main()
