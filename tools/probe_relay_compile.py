"""Probe: split the axon relay's fixed per-process overhead from
graph-size-dependent compile cost.

Round-3 context: tools/probe_compile_cache.py proved JAX's persistent
compilation cache is defeated by the relay — a warm local cache hit
(compile 0.06s) still paid 152s at first execution, i.e. the real
compile/init happens server-side per fresh process. To restructure
bench.py to fit the driver window we need to know how that server-side
cost scales with graph size.

Usage: python tools/probe_relay_compile.py <mode>
  tiny   - one add                        (pure fixed overhead)
  conv   - 4 convs (the old probe graph)  (small graph)
  b1     - full flagship B=1 fused encode+decode (round-1 bench graph)
  b4     - full flagship B=4 fused encode+decode (round-2 bench graph)
  b4x    - full flagship B=4 XLA-only (fused=False)

Prints stage timings with wall timestamps; run each mode in a FRESH
process (the relay does not cache across processes).
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

mode = sys.argv[1] if len(sys.argv) > 1 else "tiny"
T0 = time.perf_counter()


def stamp(msg):
    print(f"[{time.perf_counter()-T0:8.1f}s] {msg}", flush=True)


stamp(f"mode={mode} importing jax")
import jax
import jax.numpy as jnp
import numpy as np

stamp(f"backend={jax.default_backend()}")

if mode == "tiny":
    fn = lambda x: jnp.sum(x * 2.0 + 1.0)
    args = (jnp.ones((128, 128), jnp.float32),)
elif mode == "conv":
    def fn(x, w):
        for _ in range(4):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.silu(x)
        return jnp.sum(x)
    rs = np.random.RandomState(0)
    args = (jnp.asarray(rs.randn(2, 64, 64, 64).astype(np.float32)),
            jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05))
else:
    from vidtok_tpu import load_model_from_config
    B = 1 if mode == "b1" else 4
    fused = mode != "b4x"
    stamp("loading model")
    tok = load_model_from_config(
        os.path.join(ROOT, "configs", "vidtok_kl_causal_488_16chn.yaml"),
        init_shape=(1, 5, 64, 64), compute_dtype=jnp.bfloat16)
    full = tok._full_forward_fn(sample=False, fused=fused)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        tok.params)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(B, 3, 17, 256, 256).astype(np.float32) * 0.5)

    def fn(params, x, rng):
        z, dec, log = full(params, x, rng)
        return jnp.sum(dec), jnp.sum(z)
    args = (params, x, rng)

stamp("lowering")
lowered = jax.jit(fn).lower(*args)
stamp("local compile")
compiled = lowered.compile()
stamp("first exec")
out = compiled(*args)
v = float(out[0] if isinstance(out, tuple) else out)
stamp(f"first exec done value={v:.3e}")
t0 = time.perf_counter()
out = compiled(*args)
v = float(out[0] if isinstance(out, tuple) else out)
stamp(f"second exec done ({time.perf_counter()-t0:.2f}s)")
