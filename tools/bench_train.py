"""Training performance campaign: the flagship GAN train step on real TPU.

The reference's primary workload is training (README.md:250-315: single
stage 50k steps @ 256x256 global batch 16 = 3,072 GPU-hours; two-stage
50k @ 128x128 b16 + 30k @ 256x256 b8 fix_encoder = 1,536 GPU-hours).
That makes the reference's measured training throughput

    50,000 steps * 16 clips * 17 frames / (3,072 h * 3600 s)
      = 1.23 frames-trained/s per GPU  (256p single-stage recipe)

This tool measures our side of that ledger on one v5e chip: for each
matrix cell (batch, resolution, remat, disc type, precision) it AOT-
compiles the FULL jitted dual-optimizer GAN train step
(vidtok_tpu/train/trainer.py), reads the compiler's HBM accounting
(compiled.memory_analysis()), then times real steps (scalar
materialization = sync on the axon relay, see CLAUDE.md) and reports
ms/step, frames-trained/s/chip, and the projected chip-hours for the
reference recipe.

Usage:
  python tools/bench_train.py matrix            # the HBM-fit + timing matrix
  python tools/bench_train.py trace             # device trace of one G+D step
  python tools/bench_train.py matrix b2_256_r0_2d_bf16 ...   # chosen cells

Each cell is a fresh server-side compile through the relay (~10-30 min);
the matrix is ordered so the headline cells land first and every
completed cell prints a full JSON line immediately.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CFG_PATH = os.environ.get(
    "VIDTOK_TRAIN_CFG",
    os.path.join(ROOT, "configs", "vidtok_kl_causal_488_16chn.yaml"))

# Reference recipe constants (reference README.md:250-251,296,315)
REF_SINGLE_GPU_HOURS = 3072.0      # 50k steps, global batch 16, 256x256
REF_SINGLE_STEPS, REF_SINGLE_BATCH = 50_000, 16
REF_TWOSTAGE_GPU_HOURS = 1536.0    # 50k b16 @128 + 30k b8 @256
REF_FRAMES = 17
REF_FPS_TRAINED_PER_GPU = (REF_SINGLE_STEPS * REF_SINGLE_BATCH * REF_FRAMES
                           / (REF_SINGLE_GPU_HOURS * 3600.0))  # 1.23


def parse_cell(spec):
    """'b2_256_r0_2d_bf16' -> dict. remat: r0 = none, r1 = enc+dec,
    r2 = decoder only (the encoder fwd is stored; skips its recompute)."""
    b, hw, r, disc, prec = spec.split("_")
    remat = {"r0": (False, False), "r1": (True, True),
             "r2": (False, True)}[r]
    return dict(b=int(b[1:]), hw=int(hw), remat=remat, disc=disc,
                precision="bf16-mixed" if prec == "bf16" else "fp32",
                spec=spec)


# Pass-2 matrix (after the round-5 memory fixes: bf16 LPIPS + LPIPS remat
# + aux-stage remat). Pass-1 pre-fix HBM needs are in BENCH_NOTES (all 7
# cells OOM'd; b1_r0 needed 25.76G of 15.75G).
# Pass-3 cells: the ones pass 2 proved compile-fit (b1_256_r1 15.04G,
# b1_256_r1_3d 15.35G of 15.75G) plus 128p remat cells sized from
# b8_128_r1's 19.13G need (-> b4 ~ fits).
DEFAULT_CELLS = [
    "b1_256_r1_2d_bf16",   # headline shape, full remat (+trace)
    "b1_256_r1_3d_bf16",   # 3d discriminator variant
    "b4_128_r1_2d_bf16",   # stage-1 shape (two-stage recipe)
    "b2_128_r1_2d_bf16",
    "b2_128_r0_2d_bf16",   # 128p unrematted (LPIPS fixes alone)
]


def build_trainer(cell):
    from vidtok_tpu.config import load_config
    from vidtok_tpu.train.trainer import VidTokTrainer

    cfg = load_config(CFG_PATH)
    p = cfg["model"]["params"]
    enc_r, dec_r = cell["remat"]
    p["encoder_config"]["params"]["use_checkpoint"] = bool(enc_r)
    p["decoder_config"]["params"]["use_checkpoint"] = bool(dec_r)
    if os.environ.get("VIDTOK_TRAIN_FIXENC", "0") == "1":
        # stage-2 of the two-stage recipe: decoder-only fine-tune
        # (reference README.md:296-315)
        p["encoder_config"]["params"]["fix_encoder"] = True
    p["loss_config"]["params"]["disc_type"] = cell["disc"]
    cfg.setdefault("training", {})["precision"] = cell["precision"]
    cfg.pop("data", None)

    # single-chip bench: default mesh is (1,1); the timed path calls the
    # jitted step directly (no shard_batch plumbing)
    return VidTokTrainer(cfg)


def make_batch(cell, t):
    import numpy as np

    rs = np.random.RandomState(7)
    x = (rs.rand(cell["b"], t, cell["hw"], cell["hw"], 3) * 2 - 1)
    return x.astype(np.float32)


def mem_report(compiled):
    try:
        ma = compiled.memory_analysis()
        gb = 1024 ** 3
        return {
            "hbm_args_gb": round(ma.argument_size_in_bytes / gb, 3),
            "hbm_out_gb": round(ma.output_size_in_bytes / gb, 3),
            "hbm_temp_gb": round(ma.temp_size_in_bytes / gb, 3),
            "hbm_code_gb": round(ma.generated_code_size_in_bytes / gb, 3),
            # donate_argnums=(0,) aliases the state output onto the input
            # buffers, so peak ~= args + temp + code (out not added twice)
            "hbm_peak_gb": round(
                (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                 + ma.generated_code_size_in_bytes) / gb, 3),
        }
    except Exception as e:  # relay may not expose it
        return {"hbm_note": f"memory_analysis unavailable: {e}"}


def compile_cell(tr, cell, t=REF_FRAMES):
    """Returns (compiled, state, x, lpips_params) AOT-compiled."""
    import jax
    import jax.numpy as jnp

    x_np = make_batch(cell, t)
    # init at a tiny shape (params are shape-independent); the big shape
    # only exists inside the compiled step
    state = tr.init_state(x_np[:1, :5, :64, :64])
    x = jnp.asarray(x_np)
    rng = jax.random.PRNGKey(0)
    step = jax.jit(tr.build_train_step(), donate_argnums=(0,))
    t0 = time.perf_counter()
    lowered = step.lower(state, x, tr.lpips_params, rng)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"[{cell['spec']}] trace/lower {t1 - t0:.1f}s  "
          f"compile {t2 - t1:.1f}s", flush=True)
    return compiled, state, x, rng


def run_cell(spec, t=REF_FRAMES, n_steps=6, do_trace=None):
    import jax

    cell = parse_cell(spec)
    tr = build_trainer(cell)
    rec = dict(cell=spec, t=t)
    try:
        compiled, state, x, rng = compile_cell(tr, cell, t)
    except Exception as e:
        rec["status"] = f"COMPILE_FAIL: {type(e).__name__}: {e}"
        print(json.dumps(rec), flush=True)
        return rec
    # no fit-guard needed: the relay's server-side compile enforces the
    # 15.75G HBM limit itself (OOM cells fail compile with the exact need)
    rec.update(mem_report(compiled))
    try:
        t0 = time.perf_counter()
        state, logs = compiled(state, x, tr.lpips_params, rng)
        first = float(logs["train/aeloss"])  # sync (relay-safe)
        t_first = time.perf_counter() - t0
        times = []
        for i in range(n_steps):
            rng = jax.random.fold_in(rng, i)
            t0 = time.perf_counter()
            state, logs = compiled(state, x, tr.lpips_params, rng)
            val = float(logs["train/aeloss"])  # sync
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        frames = cell["b"] * t
        rec.update({
            "status": "OK",
            "first_exec_s": round(t_first, 2),
            "ms_per_step": round(med * 1e3, 1),
            "frames_trained_per_s": round(frames / med, 2),
            "aeloss": round(val, 4),
            "vs_ref_frames_per_gpu": round(
                frames / med / REF_FPS_TRAINED_PER_GPU, 2),
        })
        if cell["hw"] == 256:
            # chip-hours to run the single-stage recipe (50k steps,
            # global batch 16) entirely on chips like this one
            steps_total = REF_SINGLE_STEPS * REF_SINGLE_BATCH / cell["b"]
            rec["proj_single_stage_chip_hours"] = round(
                steps_total * med / 3600.0, 1)
        if do_trace:
            capture_trace(compiled, state, x, tr, rng, do_trace)
    except Exception as e:
        rec["status"] = f"RUN_FAIL: {type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(rec), flush=True)
    return rec


def capture_trace(compiled, state, x, tr, rng, trace_dir):
    import jax

    print(f"capturing train-step trace -> {trace_dir}", flush=True)
    jax.profiler.start_trace(trace_dir)
    for i in range(2):
        rng = jax.random.fold_in(rng, 100 + i)
        state, logs = compiled(state, x, tr.lpips_params, rng)
        float(logs["train/aeloss"])  # sync
    jax.profiler.stop_trace()
    from tools.profile_breakdown import parse

    rows, total = parse(trace_dir, iters=2)
    json.dump([{"ms": r[0], "count": r[1], "name": r[2], "src": r[3]}
               for r in rows[:200]],
              open("/tmp/breakdown_train.json", "w"), indent=1)
    print("wrote /tmp/breakdown_train.json", flush=True)


def _smooth_batch(cell, t, seed=99):
    """Video-like synthetic clip batch (low-frequency base + drift +
    mild noise), same recipe as tools/parity_psnr.py smooth_clip — gives
    the recon/LPIPS losses real structure to descend on."""
    import numpy as np

    hw = cell["hw"]
    rs = np.random.RandomState(seed)
    base = rs.randn(cell["b"], 1, hw // 8, hw // 8, 3)
    drift = rs.randn(cell["b"], t, hw // 8, hw // 8, 3) * 0.15
    lo = np.cumsum(drift, axis=1) * 0.3 + base
    # bilinear-ish upsample by 8 via repeat (smoothness comes from the
    # low-res generator; exact interpolation quality is irrelevant)
    up = lo.repeat(8, axis=2).repeat(8, axis=3)
    x = np.tanh(up + rs.randn(*up.shape) * 0.05)
    return x.astype(np.float32)


def run_steps(spec="b1_256_r1_2d_bf16", t=REF_FRAMES, n=200, log_every=10):
    """A REAL training run at the flagship shape on TPU: n optimizer steps
    on a fixed smooth batch (overfit protocol) with the full GAN step
    compiled once. Descending rec_loss = the training path works
    end-to-end at scale, not just for one timed step."""
    import jax

    cell = parse_cell(spec)
    tr = build_trainer(cell)
    # overfit probe LR (flagship recipe lr 1e-5 barely moves in 200 steps;
    # this demonstrates the optimization path, not the recipe)
    lr = float(os.environ.get("VIDTOK_STEPS_LR", "1e-4"))
    tr.set_lr(lr)
    print(f"[steps] lr={lr}", flush=True)
    try:
        compiled, state, x, rng = compile_cell(tr, cell, t)
    except Exception as e:
        print(json.dumps({"steps": spec,
                          "status": f"COMPILE_FAIL: {e}"}), flush=True)
        return
    import jax.numpy as jnp

    x = jnp.asarray(_smooth_batch(cell, t))
    t0 = time.perf_counter()
    first = last = None
    log_marks = []  # (step, elapsed_s) — steady-state rate from the curve
    for i in range(n):
        rng2 = jax.random.fold_in(rng, i)
        state, logs = compiled(state, x, tr.lpips_params, rng2)
        if i % log_every == 0 or i == n - 1:
            rec = float(logs["train/rec_loss"])
            tot = float(logs["train/total_loss"])
            kl = float(logs.get("train/kl_loss", 0.0))
            if first is None:
                first = rec
            last = rec
            el = time.perf_counter() - t0
            log_marks.append((i, el))
            print(f"step {i:4d}  rec_loss {rec:.4f}  total {tot:.1f}  "
                  f"kl {kl:.1f}  ({el:.0f}s)", flush=True)
    wall = time.perf_counter() - t0
    # steady-state ms/step from the last half of the curve: the relay's
    # one-time first-exec (observed up to ~12 min) would otherwise skew
    # a naive wall/n average (seen on train_fsq_steps r5)
    steady = None
    if len(log_marks) >= 3:
        (s0, e0), (s1, e1) = log_marks[len(log_marks) // 2], log_marks[-1]
        if s1 > s0:
            steady = (e1 - e0) / (s1 - s0) * 1e3
    print(json.dumps({
        "steps_run": n, "cell": spec, "wall_s": round(wall, 1),
        "steady_ms_per_step": round(steady, 1) if steady else None,
        "rec_loss_first": round(first, 4), "rec_loss_last": round(last, 4),
        "rec_drop_pct": round(100 * (1 - last / first), 1),
        "descending": last < first * 0.9}), flush=True)


def run_pipeline(spec="b1_256_r1_2d_bf16", t=REF_FRAMES, n=30):
    """Train steps fed by the REAL input pipeline (native/OpenCV video
    decode -> VidTokDataset fps-resample -> ThreadedLoader workers ->
    device_prefetch), timing ms/step INCLUDING input — closes the
    'synthetic batches' caveat on the training ledger."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidtok_tpu.data.dataset import VidTokDataset
    from vidtok_tpu.data.pipeline import ThreadedLoader, device_prefetch
    from vidtok_tpu.data.video_reader import write_video

    cell = parse_cell(spec)
    hw = cell["hw"]
    d = "/tmp/vidtok_train_pipe"
    os.makedirs(d, exist_ok=True)
    rs = np.random.RandomState(0)
    names = []
    for i in range(4):
        lo = (np.cumsum(rs.randn(33, hw // 8, hw // 8, 3) * 0.15, axis=0)
              + rs.randn(1, hw // 8, hw // 8, 3))
        up = np.tanh(lo.repeat(8, axis=1).repeat(8, axis=2) * 0.3)
        frames = ((up * 0.5 + 0.5) * 255).astype(np.uint8)
        write_video(os.path.join(d, f"clip{i}.mp4"), frames, fps=30)
        names.append(f"clip{i}.mp4")
    with open(os.path.join(d, "meta.csv"), "w") as f:
        f.write("videos\n" + "\n".join(names) + "\n")

    ds = VidTokDataset(
        data_dir=d, meta_path=os.path.join(d, "meta.csv"),
        video_params=dict(input_height=hw, input_width=hw,
                          sample_num_frames=t, sample_fps=30), seed=0)
    loader = ThreadedLoader(ds, batch_size=cell["b"], shuffle=True,
                            num_workers=2,
                            epoch_len=(n + 4) * cell["b"])

    tr = build_trainer(cell)
    compiled, state, x, rng = compile_cell(tr, cell, t)
    times = []
    i = 0
    t_prev = time.perf_counter()
    def _to_device(b):
        return {"jpg": jnp.asarray(b["jpg"])}

    for batch in device_prefetch(loader.epoch(0), _to_device, depth=2):
        rng2 = jax.random.fold_in(rng, i)
        state, logs = compiled(state, batch["jpg"], tr.lpips_params, rng2)
        val = float(logs["train/aeloss"])  # sync
        now = time.perf_counter()
        times.append(now - t_prev)
        t_prev = now
        i += 1
        if i >= n:
            break
    times = sorted(times[2:])  # drop warmup steps
    med = times[len(times) // 2]
    print(json.dumps({
        "pipeline_steps": i, "cell": spec,
        "ms_per_step_incl_input": round(med * 1e3, 1),
        "frames_trained_per_s_incl_input": round(cell["b"] * t / med, 2),
        "aeloss": round(val, 4)}), flush=True)


def run_vidtwin(b=2, t=16, hw=224, n_steps=6):
    """VidTwin GAN train step at the shipped config's shape (VERDICT r4
    weak #7; reference vidtwin_ae.py:86-137 is the trainer being timed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidtok_tpu.models.vidtwin.trainer import VidTwinTrainer

    cfg_path = os.path.join(ROOT, "configs", "vidtwin",
                            "vidtwin_structure_7_7_8_dynamics_7_8.yaml")
    tr = VidTwinTrainer(cfg_path)
    rec = dict(cell=f"vidtwin_b{b}_{hw}_{tr.precision}", t=t)
    rs = np.random.RandomState(7)
    x_np = (rs.rand(b, t, hw, hw, 3) * 2 - 1).astype(np.float32)
    state = tr.init_state(x_np)
    x = jnp.asarray(x_np)
    rng = jax.random.PRNGKey(0)
    step = jax.jit(tr.build_train_step(), donate_argnums=(0,))
    try:
        t0 = time.perf_counter()
        lowered = step.lower(state, x, tr.lpips_params, rng)
        compiled = lowered.compile()
        print(f"[vidtwin] lower+compile {time.perf_counter() - t0:.1f}s",
              flush=True)
        rec.update(mem_report(compiled))
        state, logs = compiled(state, x, tr.lpips_params, rng)
        float(logs["train/aeloss"])  # sync
        times = []
        for i in range(n_steps):
            rng = jax.random.fold_in(rng, i)
            t0 = time.perf_counter()
            state, logs = compiled(state, x, tr.lpips_params, rng)
            val = float(logs["train/aeloss"])
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        rec.update({"status": "OK", "ms_per_step": round(med * 1e3, 1),
                    "frames_trained_per_s": round(b * t / med, 2),
                    "aeloss": round(val, 4)})
    except Exception as e:
        rec["status"] = f"FAIL: {type(e).__name__}: {str(e)[:300]}"
    print(json.dumps(rec), flush=True)
    return rec


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "matrix"
    cells = sys.argv[2:]
    t = int(os.environ.get("VIDTOK_TRAIN_T", str(REF_FRAMES)))
    from vidtok_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    print("backend:", jax.default_backend(), "devices:", jax.devices(),
          flush=True)
    print(f"reference training baseline: "
          f"{REF_FPS_TRAINED_PER_GPU:.3f} frames-trained/s/GPU "
          f"(3,072 GPU-h / 50k steps / b16 @ 17x256x256)", flush=True)

    if mode == "trace":
        spec = cells[0] if cells else "b1_256_r0_2d_bf16"
        run_cell(spec, t=t, n_steps=3, do_trace="/tmp/vidtok_prof_train")
        return
    if mode == "vidtwin":
        run_vidtwin(b=int(cells[0]) if cells else 2)
        return
    if mode == "steps":
        run_steps(cells[0] if cells else "b1_256_r1_2d_bf16", t=t,
                  n=int(cells[1]) if len(cells) > 1 else 200)
        return
    if mode == "pipeline":
        run_pipeline(cells[0] if cells else "b1_256_r1_2d_bf16", t=t,
                     n=int(cells[1]) if len(cells) > 1 else 30)
        return

    # trace the first cell inside the same process (the relay recompiles
    # per process, so a separate trace run would pay the compile again)
    trace_first = os.environ.get("VIDTOK_TRAIN_TRACE", "1") == "1"
    results = []
    for i, spec in enumerate(cells or DEFAULT_CELLS):
        results.append(run_cell(
            spec, t=t,
            do_trace="/tmp/vidtok_prof_train" if trace_first and i == 0
            else None))
    print("\n== matrix summary ==")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
