"""Per-op device-time breakdown of encode/decode on the real TPU.

Captures a jax.profiler trace of the jitted (fused, bf16) flagship
encode/decode, parses the trace.json.gz TPU-device track, and aggregates
fusion durations by name + source attribution. This is the tool that
directs kernel work: it produced the add_add/convert_reduce finding that
led to the fused temporal resblock (+25%).

  python tools/profile_breakdown.py decode   # or: encode

Axon quirk (see docs/BENCH_NOTES.md): block_until_ready doesn't block over
the relay — a scalar materialization is used to sync before stop_trace.
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(which):
    """Same graphs as tools/bench_suite.py encode/decode (compile-cache
    friendly on the relay)."""
    from vidtok_tpu import load_model_from_config
    from vidtok_tpu.models.autoencoder import TokenizerCore, _to_nthwc

    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs",
        "vidtok_kl_causal_488_16chn.yaml")
    tok = load_model_from_config(cfg, init_shape=(1, 5, 64, 64),
                                 compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16),
                                    tok.params)
    B = int(os.environ.get("VIDTOK_PROF_B", "1"))
    T = int(os.environ.get("VIDTOK_PROF_T", "17"))
    H = W = 256

    if which == "scandec":
        # Scan-stream decode (the slow serving path: ~12.8 ms/frame vs
        # batch decode's ~4.8 ms/slot) — trace it to attribute the gap.
        # VIDTOK_PROF_S streams, 129-frame video, chunk width from
        # VIDTOK_SCAN_TCDEC (default model config).
        S = int(os.environ.get("VIDTOK_PROF_S", "4"))
        Tv = 129
        tok.params = params
        tok.use_tiling = True
        tok.use_overlap = False
        tok.t_chunk_dec = int(os.environ.get("VIDTOK_SCAN_TCDEC",
                                             tok.t_chunk_dec))
        tdf = tok.time_downsample_factor
        z = jnp.asarray(np.random.RandomState(2)
                        .randn(S, 16, 1 + (Tv - 1) // tdf, H // 8, W // 8)
                        .astype(np.float32) * 0.5)
        return (lambda: float(jnp.sum(tok.decode_streaming_scan(z)))), None

    if which == "encode":
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(B, 3, T, H, W).astype(np.float32) * 0.5)
        rng = jax.random.PRNGKey(0)

        @jax.jit
        def enc(params, x, rng):
            xt = _to_nthwc(x).astype(jnp.bfloat16)
            z, log = tok.core.apply(
                {"params": params}, xt, sample_override=False, fused=True,
                rngs={"sample": rng}, method=TokenizerCore.encode)
            return jnp.sum(z)

        return (lambda: enc(params, x, rng)), None
    else:
        z = jnp.asarray(np.random.RandomState(1)
                        .randn(B, 16, (T + 3) // 4, 32, 32)
                        .astype(np.float32) * 0.5)

        @jax.jit
        def dec(params, z):
            zt = _to_nthwc(z).astype(jnp.bfloat16)
            d = tok.core.apply({"params": params}, zt, fused=True,
                               method=TokenizerCore.decode)
            return jnp.sum(d)

        return (lambda: dec(params, z)), None


def capture(fn, trace_dir):
    for _ in range(2):  # compile + warm
        float(fn())
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        float(fn())  # scalar materialization == real sync on the relay
    jax.profiler.stop_trace()


def parse(trace_dir, iters=3):
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find TPU device pids (XLA Op lines live under /device:TPU:N)
    tpu_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    agg = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        src = args.get("source_info") or args.get("tf_op") or ""
        key = (name, src)
        d = agg.setdefault(key, [0.0, 0])
        d[0] += e.get("dur", 0) / 1e3  # us -> ms
        d[1] += 1
    rows = sorted(((v[0] / iters, v[1] // iters, k[0], k[1])
                   for k, v in agg.items()), reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\n== device total {total:.1f} ms/iter ==")
    for ms, cnt, name, src in rows[:40]:
        print(f"{ms:8.2f} ms  x{cnt:<3d} {name[:60]:<60s} {src[:70]}")
    return rows, total


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "decode"
    trace_dir = f"/tmp/vidtok_prof_{which}"
    fn, _ = build(which)
    capture(fn, trace_dir)
    rows, total = parse(trace_dir)
    json.dump([{"ms": r[0], "count": r[1], "name": r[2], "src": r[3]}
               for r in rows],
              open(f"/tmp/breakdown_{which}.json", "w"), indent=1)
    print(f"\nwrote /tmp/breakdown_{which}.json")
