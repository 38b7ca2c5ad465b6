"""Benchmark: flagship encode+decode sustained throughput on one chip.

Protocol: vidtok_kl_causal_488_16chn (bf16, fused kernels), 17x256x256
clips, batch 4, dispatch pipelined at depth 2 (launch step i, sync step
i-2). This is the per-chip number a throughput deployment gets: batching
amortizes per-call host/relay dispatch and widens the per-frame convs
(N=B*T) for the MXU; pipelining overlaps the remaining dispatch latency
with device execution. The BASELINE.json target is throughput (>= 5x
realtime per chip = 150 frames/s at 30 fps), so the best-batch sustained
number is the honest headline; single-call B=1 latency is tracked
separately in tools/bench_suite.py.

Cold-start budget (the round-2 driver bench timed out, BENCH_r02.json
rc=124): the axon relay recompiles everything server-side per fresh
process (a local persistent compile cache does NOT help — measured in
tools/probe_compile_cache.py: warm local cache hit, first exec still
152s). Mitigations here: model init runs on the host CPU backend
(saves the ~7-minute relay init trip), and a preliminary JSON line is
printed from a short measurement as soon as the main graph is compiled,
then refined with the full measurement. Every printed line is a
complete, honest result; the last line printed before any timeout is
the one that counts.

Output: JSON lines of the form
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
(final line = full-protocol measurement).
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BASELINE_FPS = 150.0  # 5x realtime @ 30fps
BATCH = 4
DEPTH = 2


def _emit(fps, note):
    print(json.dumps({
        "metric": ("256p frames/sec/chip encode+decode sustained "
                   "(kl_causal_488_16chn, bf16, fused, batch=4, "
                   "pipelined dispatch%s)" % note),
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }), flush=True)


def main():
    from vidtok_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidtok_tpu import load_model_from_config

    tok = load_model_from_config(
        os.path.join(ROOT, "configs", "vidtok_kl_causal_488_16chn.yaml"),
        init_shape=(1, 5, 64, 64),
        compute_dtype=jnp.bfloat16,
    )

    B, T, H, W = BATCH, 17, 256, 256
    x = jnp.asarray(
        np.random.RandomState(0).randn(B, 3, T, H, W).astype(np.float32) * 0.5)

    fn = tok._full_forward_fn(sample=False, fused=True)
    # Serve with bf16 weights at rest (halves HBM weight traffic); the
    # compute path is bf16 with fp32 norm/epilogue stats regardless.
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16)
                                    if p.dtype == jnp.float32 else p,
                                    tok.params)
    rng = jax.random.PRNGKey(0)

    @jax.jit
    def step(params, x, rng):
        z, dec, log = fn(params, x, rng)
        # scalar output: device-side sync point (block_until_ready does not
        # actually block on the axon platform; materializing a scalar does)
        return jnp.sum(dec), jnp.sum(z)

    def run(iters):
        pending = []
        t0 = time.perf_counter()
        for _ in range(iters):
            pending.append(step(params, x, rng))
            if len(pending) > DEPTH:
                float(pending.pop(0)[0])  # sync the oldest launch
        for p in pending:
            float(p[0])
        return B * T * iters / (time.perf_counter() - t0)

    # warmup / compile (the expensive part on a cold relay process)
    float(step(params, x, rng)[0])
    float(step(params, x, rng)[0])

    # preliminary result the moment the graph is hot: if the driver's
    # timeout lands between here and the full run, this line still records
    # an honest (short-window) measurement
    _emit(run(6), ", 6-iter preliminary")
    _emit(run(16), "")


if __name__ == "__main__":
    main()
