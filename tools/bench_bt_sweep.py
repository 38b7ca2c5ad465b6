"""(B, T) serving-protocol sweep for the flagship bench.

The causal time pad is a FIXED 3-frame cost per clip (T frames in ->
T+3 computed through the decoder, reference model_3dcausal.py:674-689,
873-885): at T=17 that is 17.6% of decode compute wasted; at T=65 it is
4.4%. Longer clips also keep N = B*(T+3) (the spatial convs' effective
batch) constant while raising useful-frames/computed-frame, so sustained
frames/s/chip should rise with T at matched memory. This sweep measures
it (pipelined depth-2 dispatch, bf16, fused kernels — the bench.py
protocol at each B/T).

  python tools/bench_bt_sweep.py [B:T[:nofuse] ...]   default 4:17 2:33 1:65 1:81
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vidtok_tpu import load_model_from_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    combos = []
    for a in sys.argv[1:]:
        parts = a.split(":")
        combos.append((int(parts[0]), int(parts[1]), "nofuse" in parts))
    combos = combos or [(4, 17, False), (1, 81, False), (1, 161, False)]
    tok = load_model_from_config(
        os.path.join(ROOT, "configs", "vidtok_kl_causal_488_16chn.yaml"),
        init_shape=(1, 5, 64, 64), compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        tok.params)
    rng = jax.random.PRNGKey(0)
    H = W = 256

    def make_step(fused):
        fn = tok._full_forward_fn(sample=False, fused=fused)

        @jax.jit
        def step(params, x, rng):
            z, dec, log = fn(params, x, rng)
            return jnp.sum(dec.astype(jnp.float32))

        return step

    steps = {}
    for B, T, nofuse in combos:
        if nofuse not in steps:
            steps[nofuse] = make_step(not nofuse)
        step = steps[nofuse]
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(B, 3, T, H, W).astype(np.float32) * 0.5)
        t0 = time.perf_counter()
        try:
            float(step(params, x, rng))  # compile+warm
        except Exception as e:  # OOM combos report and continue
            print(f"B={B} T={T}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"B={B} T={T}: compiled+first in {time.perf_counter()-t0:.0f}s",
              flush=True)
        float(step(params, x, rng))
        iters, depth = 10, 2
        pending = []
        t0 = time.perf_counter()
        for _ in range(iters):
            pending.append(step(params, x, rng))
            if len(pending) > depth:
                float(pending.pop(0))
        for p in pending:
            float(p)
        wall = time.perf_counter() - t0
        per = wall / iters
        print(f"B={B} T={T} slots={B*(T+3)}: {per*1e3:7.1f} ms/call  "
              f"{B*T/per:6.1f} frames/s/chip", flush=True)


if __name__ == "__main__":
    main()
