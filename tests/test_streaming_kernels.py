"""Parity tests for the streaming Pallas kernel paths (round 4).

The scan-stream decode trace (bench_artifacts/trace_scandec_fused.log)
attributed all streaming-vs-batch excess to temporal stages running
unfused XLA chunk graphs; these tests pin the new streaming kernel paths
to the unfused streaming semantics EXACTLY — randomized params per the
activated-halo lesson (BENCH_NOTES: structured init hid a real bug once).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vidtok_tpu.modules.blocks as blocks
from vidtok_tpu.modules.blocks import ResnetBlockTemporal, TimeUpsampleRes2x


def _rand_tree(params, rng, scale=0.05):
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32) * scale),
        params)


def _run_stream(blk, params, chunks, *, fused, use_off):
    outs, cache = [], {}
    for i, xc in enumerate(chunks):
        var = {"params": params}
        if i > 0:
            var["cache"] = cache
        y, vs = blk.apply(var, xc, streaming=True, first_chunk=(i == 0),
                          use_cache_offset=use_off, fused=fused,
                          mutable=["cache"])
        cache = vs["cache"]
        outs.append(y)
    return jnp.concatenate(outs, axis=1)


@pytest.mark.parametrize("off,use_off", [(0, False), (1, True), (2, True),
                                         (4, True)])
def test_streaming_fused_temporal_resblock(off, use_off):
    """fused_temporal_resblock_stream == unfused CausalConv1d streaming
    (replicate-at-start, offset-adjusted caches) across 3 chunks."""
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 8, 16, 128
    blk = ResnetBlockTemporal(out_channels=C, causal=True,
                              norm_type="layernorm",
                              first_pad_mode="replicate", cache_offset=off)
    chunks = [jnp.asarray(rng.randn(B, t, H, W, C).astype(np.float32) * 0.5)
              for t in (max(1, off), 4 * max(1, off), 4 * max(1, off))]
    params = _rand_tree(blk.init(jax.random.PRNGKey(0), chunks[0])["params"],
                        rng)
    params["norm1"]["scale"] = 1 + jnp.asarray(rng.randn(C) * 0.1,
                                               jnp.float32)
    params["norm2"]["scale"] = 1 + jnp.asarray(rng.randn(C) * 0.1,
                                               jnp.float32)
    a = _run_stream(blk, params, chunks, fused=False, use_off=use_off)
    b = _run_stream(blk, params, chunks, fused=True, use_off=use_off)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("off,t0", [(0, 1), (2, 1), (4, 2)])
def test_streaming_parity_upsample(off, t0):
    """Streaming parity fast path (cached source frame + dropped first
    output pair) == unfused nearest-up + CausalConv3d streaming, for the
    decoder's even cache offsets including the offset-at-boundary first
    chunk."""
    rng = np.random.RandomState(1)
    B, H, W, C = 2, 8, 16, 128
    blk = TimeUpsampleRes2x(out_channels=C, causal=True,
                            interpolation_mode="nearest",
                            first_pad_mode="zero", cache_offset=off)
    chunks = [jnp.asarray(rng.randn(B, t, H, W, C).astype(np.float32) * 0.5)
              for t in (t0, 4, 4)]
    params = _rand_tree(blk.init(jax.random.PRNGKey(0), chunks[0])["params"],
                        rng)

    def run(parity, use_off):
        old = blocks._PARITY_UPSAMPLE
        blocks._PARITY_UPSAMPLE = parity
        try:
            return _run_stream(blk, params, chunks, fused=False,
                               use_off=use_off)
        finally:
            blocks._PARITY_UPSAMPLE = old

    for use_off in (False, True):
        a = run(False, use_off)
        b = run(True, use_off)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_streaming_path_latch():
    """Advisor r4 (medium): the fused/unfused streaming decision must not
    flip mid-stream (the two paths keep caches under different names; a
    flip would silently zero-init the other path's cache). (a) If the
    FIRST chunk ran unfused, later fused-eligible chunks must latch onto
    the unfused path and match the pure-unfused stream exactly. (b) The
    reverse flip (first chunk fused, later chunk not) raises instead of
    silently corrupting."""
    rng = np.random.RandomState(3)
    B, H, W, C = 1, 8, 16, 128
    blk = ResnetBlockTemporal(out_channels=C, causal=True,
                              norm_type="layernorm",
                              first_pad_mode="replicate", cache_offset=2)
    chunks = [jnp.asarray(rng.randn(B, 4, H, W, C).astype(np.float32) * 0.5)
              for _ in range(3)]
    params = _rand_tree(blk.init(jax.random.PRNGKey(0), chunks[0])["params"],
                        rng)
    params["norm1"]["scale"] = 1 + jnp.asarray(rng.randn(C) * 0.1, jnp.float32)
    params["norm2"]["scale"] = 1 + jnp.asarray(rng.randn(C) * 0.1, jnp.float32)

    def run(fused_per_chunk):
        outs, cache = [], {}
        for i, (xc, fu) in enumerate(zip(chunks, fused_per_chunk)):
            var = {"params": params}
            if i > 0:
                var["cache"] = cache
            y, vs = blk.apply(var, xc, streaming=True, first_chunk=(i == 0),
                              use_cache_offset=True, fused=fu,
                              mutable=["cache"])
            cache = vs["cache"]
            outs.append(y)
        return jnp.concatenate(outs, axis=1)

    # (a) first chunk unfused -> later fused-eligible chunks stay unfused
    a = run([False, False, False])
    b = run([False, True, True])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # (b) first chunk fused, then a non-fused chunk -> loud error
    with pytest.raises(ValueError, match="path flip"):
        run([True, False, False])


def test_streaming_decoder_tail():
    """Streaming decoder tail (2 cached raw frames + batch kernel in
    replicate mode) == the unfused streaming norm_out+silu+conv_out exit,
    including the v1.0 per-chunk crop."""
    from vidtok_tpu.modules.decoder import Decoder

    rng = np.random.RandomState(2)
    dec = Decoder(ch=16, ch_mult=(1, 2, 2, 4), num_res_blocks=1, z_channels=8,
                  out_ch=3, norm_type="layernorm", variant="causal_v1_1")
    z0 = jnp.asarray(rng.randn(1, 1, 4, 4, 8).astype(np.float32) * 0.5)
    zk = jnp.asarray(rng.randn(1, 2, 4, 4, 8).astype(np.float32) * 0.5)
    params = dec.init(jax.random.PRNGKey(0), z0)["params"]

    def run(fused):
        outs, cache = [], {}
        for i, zc in enumerate((z0, zk, zk)):
            var = {"params": params}
            if i > 0:
                var["cache"] = cache
            y, vs = dec.apply(var, zc, streaming=True, first_chunk=(i == 0),
                              use_cache_offset=True, fused=fused,
                              mutable=["cache"])
            cache = vs["cache"]
            outs.append(y)
        return jnp.concatenate(outs, axis=1)

    a = run(False)
    b = run(True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("kpack", [True])
def test_kpack_matches_baseline(kpack):
    """K-packed tap matmuls are the same sums re-associated (f32
    accumulate) — exact to float tolerance on both kernels. Probed
    neutral-to-worse on v5e (bench_artifacts/probe_kpack.log), kept
    probe-selectable."""
    from vidtok_tpu.ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2
    from vidtok_tpu.ops.pallas.fused_temporal import fused_temporal_resblock

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 32, 32, 128).astype(np.float32) * 0.3)
    p = {
        "norm1": {"scale": 1 + jnp.asarray(rng.randn(128) * 0.1, jnp.float32),
                  "bias": jnp.asarray(rng.randn(128) * 0.1, jnp.float32)},
        "conv1": {"kernel": jnp.asarray(rng.randn(1, 3, 3, 128, 128) * 0.02,
                                        jnp.float32),
                  "bias": jnp.asarray(rng.randn(128) * 0.01, jnp.float32)},
        "norm2": {"scale": 1 + jnp.asarray(rng.randn(128) * 0.1, jnp.float32),
                  "bias": jnp.asarray(rng.randn(128) * 0.1, jnp.float32)},
        "conv2": {"kernel": jnp.asarray(rng.randn(1, 3, 3, 128, 128) * 0.02,
                                        jnp.float32),
                  "bias": jnp.asarray(rng.randn(128) * 0.01, jnp.float32)},
    }
    a = fused_spatial_resblock_v2(x=x, params=p, kpack=False)
    b = fused_spatial_resblock_v2(x=x, params=p, kpack=kpack)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    pt = {k: ({"kernel": jnp.asarray(rng.randn(3, 1, 1, 128, 128) * 0.05,
                                     jnp.float32),
               "bias": jnp.asarray(rng.randn(128) * 0.01, jnp.float32)}
              if k.startswith("conv") else p[k])
          for k in ("norm1", "conv1", "norm2", "conv2")}
    xt = jnp.asarray(rng.randn(2, 9, 8, 16, 128).astype(np.float32) * 0.3)
    for mode in ("zero", "replicate"):
        ta = fused_temporal_resblock(xt, pt, first_pad_mode=mode, kpack=False)
        tb = fused_temporal_resblock(xt, pt, first_pad_mode=mode, kpack=kpack)
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb), atol=1e-5)


def test_subpixel_merged_matches():
    """Merged-z subpixel path (one padded input + one 4C VALID conv +
    offset-reading epilogue) == the naive nearest-up + 3x3 conv."""
    import vidtok_tpu.modules.blocks as blocks
    from vidtok_tpu.modules.conv import _conv2d_frames
    from vidtok_tpu.modules.interp import spatial_nearest_up2x

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 3, 12, 16, 128).astype(np.float32) * 0.5)
    k = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    ref = _conv2d_frames(spatial_nearest_up2x(x), k, (1, 1),
                         [(1, 1), (1, 1)]) + b
    old = blocks._SUBPIXEL_MERGED
    try:
        blocks._SUBPIXEL_MERGED = True
        m = blocks._subpixel_up2x_conv3x3(x, k, b, allow_pallas=True)
    finally:
        blocks._SUBPIXEL_MERGED = old
    np.testing.assert_allclose(np.asarray(m), np.asarray(ref), atol=1e-5)
