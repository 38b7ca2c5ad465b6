"""The video tokenizer model.

Two layers:

* ``TokenizerCore`` — a pure flax module combining encoder, regularizer and
  decoder. All state (streaming caches) is explicit; every entry point is a
  pure function of (params, cache, inputs).
* ``VideoTokenizer`` — the user-facing engine mirroring the reference
  ``AutoencodingEngine`` API (reference vidtok/models/autoencoder.py:98-366
  and autoencoder_v1_1.py:98-479): ``encode`` / ``decode`` / ``__call__``
  over ``[B, C, T, H, W]`` tensors in [-1, 1], plus tiled streaming
  inference for arbitrary-length videos. Internally everything is
  channels-last and jitted; chunked streaming runs as compiled fixed-shape
  steps with the causal cache threaded through ``jax.lax.scan``.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import load_config
from ..modules.decoder import Decoder
from ..modules.encoder import Encoder
from ..modules.regularizers import DiagonalGaussianRegularizer, FSQRegularizer


# ---------------------------------------------------------------------------
# Config translation
# ---------------------------------------------------------------------------

_ENC_VARIANTS = {
    "EncoderCausal3D": "causal",
    "EncoderCausal3DV1_1": "causal_v1_1",
    "Encoder3D": "noncausal",
}
_DEC_VARIANTS = {
    "DecoderCausal3D": "causal",
    "DecoderCausal3DV1_1": "causal_v1_1",
    "Decoder3D": "noncausal",
}


def _resolve_target_name(target: str) -> str:
    from ..registry import _ALIASES

    return _ALIASES.get(target, target)


def build_core_from_config(model_cfg: dict) -> Tuple["TokenizerCore", dict]:
    """Translate a reference-style model config into a TokenizerCore.

    ``model_cfg`` is the ``model:`` section (with ``params`` holding
    encoder_config/decoder_config/regularizer_config). Returns the module and
    a metadata dict (is_causal, variant, tdf, tiling defaults, ...).
    """
    p = model_cfg.get("params", model_cfg)
    enc_cfg = p["encoder_config"]
    dec_cfg = p.get("decoder_config", enc_cfg)
    reg_cfg = p["regularizer_config"]

    enc_variant = _ENC_VARIANTS[_resolve_target_name(enc_cfg["target"])]
    dec_variant = _DEC_VARIANTS.get(
        _resolve_target_name(dec_cfg["target"]),
        enc_variant.replace("Encoder", "Decoder"),
    )
    ep = dict(enc_cfg.get("params") or {})
    dp = dict(dec_cfg.get("params") or {})

    def common(d, variant):
        return dict(
            ch=d.get("ch", 128),
            ch_mult=tuple(d.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=d.get("num_res_blocks", 2),
            z_channels=d["z_channels"],
            norm_type=d.get("norm_type", "groupnorm"),
            dropout=d.get("dropout", 0.0),
            time_downsample_factor=d.get("time_downsample_factor", 4),
            use_checkpoint=d.get("use_checkpoint", False),
            variant=variant,
        )

    encoder = Encoder(
        in_channels=ep.get("in_channels", 3),
        double_z=ep.get("double_z", True),
        spatial_ds=tuple(ep["spatial_ds"]) if ep.get("spatial_ds") is not None else None,
        tempo_ds=tuple(ep["tempo_ds"]) if ep.get("tempo_ds") is not None else None,
        init_pad_mode=ep.get("init_pad_mode", "replicate"),
        **common(ep, enc_variant),
    )
    decoder = Decoder(
        out_ch=dp.get("out_ch", 3),
        spatial_us=tuple(dp["spatial_us"]) if dp.get("spatial_us") is not None else None,
        tempo_us=tuple(dp["tempo_us"]) if dp.get("tempo_us") is not None else None,
        interpolation_mode=dp.get("interpolation_mode", "nearest"),
        tanh_out=dp.get("tanh_out", False),
        **common(dp, dec_variant),
    )

    reg_target = _resolve_target_name(reg_cfg["target"])
    rp = dict(reg_cfg.get("params") or {})
    if reg_target == "DiagonalGaussianRegularizer":
        regularizer = DiagonalGaussianRegularizer(sample=rp.get("sample", True))
        discrete = False
    elif reg_target == "FSQRegularizer":
        regularizer = FSQRegularizer(
            levels=tuple(rp["levels"]),
            dim=rp.get("dim"),
            num_codebooks=rp.get("num_codebooks", 1),
            entropy_loss_weight=rp.get("entropy_loss_weight", 0.0),
            entropy_loss_annealing_steps=rp.get("entropy_loss_annealing_steps", 0),
            entropy_loss_annealing_factor=rp.get("entropy_loss_annealing_factor", 1.0),
            commitment_loss_weight=rp.get("commitment_loss_weight", 0.0),
            diversity_gamma=rp.get("diversity_gamma", 1.0),
        )
        discrete = True
    else:
        raise ValueError(f"unknown regularizer {reg_target}")

    core = TokenizerCore(encoder=encoder, decoder=decoder, regularizer=regularizer)
    meta = dict(
        variant=enc_variant,
        is_causal=enc_variant != "noncausal",
        discrete=discrete,
        time_downsample_factor=ep.get("time_downsample_factor", 4),
        use_tiling=p.get("use_tiling", False),
        t_chunk_enc=p.get("t_chunk_enc", 16),
        fix_encoder=ep.get("fix_encoder", False),
        fix_decoder=dp.get("fix_decoder", False),
        monitor=p.get("monitor"),
    )
    return core, meta


# ---------------------------------------------------------------------------
# Flax core
# ---------------------------------------------------------------------------


class TokenizerCore(nn.Module):
    encoder: Encoder
    decoder: Decoder
    regularizer: nn.Module

    def encode_raw(self, x, *, streaming=False, first_chunk=True,
                   deterministic=True, fused=False):
        return self.encoder(
            x, streaming=streaming, first_chunk=first_chunk,
            deterministic=deterministic, fused=fused,
        )

    def regularize(self, zp, *, n_steps=0, sample_override=None):
        return self.regularizer(zp, n_steps=n_steps, sample_override=sample_override)

    def encode(self, x, *, streaming=False, first_chunk=True, deterministic=True,
               n_steps=0, sample_override=None, fused=False):
        zp = self.encode_raw(
            x, streaming=streaming, first_chunk=first_chunk,
            deterministic=deterministic, fused=fused,
        )
        return self.regularize(zp, n_steps=n_steps, sample_override=sample_override)

    def decode(self, z, *, streaming=False, first_chunk=True, deterministic=True,
               use_cache_offset=False, fused=False):
        return self.decoder(
            z, streaming=streaming, first_chunk=first_chunk,
            deterministic=deterministic, use_cache_offset=use_cache_offset,
            fused=fused,
        )

    def decode_indices(self, indices):
        return self.regularizer.decode_indices(indices)

    def forward_train(self, x, *, n_steps=0, fix_encoder=False):
        """Training forward: (z, xrec, pre_conv_out_features, reg_log).

        ``fix_encoder`` stops gradients after encode (reference
        autoencoder.py:221-229 wraps encode in no_grad)."""
        z, reg_log = self.encode(x, deterministic=False, n_steps=n_steps)
        if fix_encoder:
            z = jax.lax.stop_gradient(z)
            reg_log = jax.tree_util.tree_map(jax.lax.stop_gradient, reg_log)
        dec, pre = self.decoder(z, deterministic=False, return_features=True)
        if dec.shape[1] != x.shape[1]:
            dec = dec[:, -x.shape[1]:]
        return z, dec, pre, reg_log

    def __call__(self, x, *, deterministic=True, n_steps=0, sample_override=None,
                 fused=False):
        z, reg_log = self.encode(
            x, deterministic=deterministic, n_steps=n_steps,
            sample_override=sample_override, fused=fused,
        )
        dec = self.decode(z, deterministic=deterministic, fused=fused)
        # v1.1 decodes tdf*T' frames; crop to input length
        # (reference autoencoder_v1_1.py:340-342)
        if dec.shape[1] != x.shape[1]:
            dec = dec[:, -x.shape[1]:]
        return z, dec, reg_log


# ---------------------------------------------------------------------------
# User-facing engine
# ---------------------------------------------------------------------------


def _to_nthwc(x):
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def _to_ncthw(x):
    return jnp.transpose(x, (0, 4, 1, 2, 3))


class VideoTokenizer:
    """Inference/serving engine over a TokenizerCore.

    Public tensors are ``[B, C, T, H, W]`` in [-1, 1] (reference layout);
    internally channels-last. All entry points are jitted and cached per
    input shape.
    """

    def __init__(self, core: TokenizerCore, params, meta: dict,
                 compute_dtype=jnp.float32, seed: int = 0,
                 fused: Optional[bool] = None):
        self.core = core
        self.params = params
        self.meta = meta
        self.compute_dtype = compute_dtype
        self.is_causal = meta["is_causal"]
        self.discrete = meta["discrete"]
        self.time_downsample_factor = meta["time_downsample_factor"]
        self.use_tiling = meta.get("use_tiling", False)
        self.t_chunk_enc = meta.get("t_chunk_enc", 16)
        self.t_chunk_dec = self.t_chunk_enc // self.time_downsample_factor
        self.use_overlap = False
        # Serving default: route through the Pallas inference kernels on
        # accelerators; on CPU they run in (slow) interpret mode, so the
        # XLA paths are the better default there. Override via the
        # constructor or VIDTOK_FUSED=0/1.
        if fused is None:
            env = os.environ.get("VIDTOK_FUSED")
            fused = (env == "1" if env in ("0", "1")
                     else jax.default_backend() != "cpu")
        self.fused = bool(fused)
        # Streaming default flipped ON in round 4: with the streaming
        # kernel paths (fused temporal resblock/parity upsample/decoder
        # tail chunk steps — the rounds-2/3 "kernels slower at chunk
        # shapes" finding predated them and also measured the WRONG env
        # gate name), single-stream scan decode measured 98.8 -> 160.1
        # fps and encode 215.3 -> 358.3 (bench_artifacts/
        # scanstream_s1_{xla,fused}.log). CPU keeps the XLA graphs
        # (kernels run in slow interpret mode there).
        envs = os.environ.get("VIDTOK_FUSED_STREAMING")
        self.fused_streaming = (envs == "1" if envs in ("0", "1")
                                else jax.default_backend() != "cpu")
        # Key construction + splitting stay on the host CPU backend; keys
        # are tiny and feeding them to a device computation transfers them
        # implicitly. (Under the axon relay, making the PRNGKey the process's
        # first TPU execution would cost a full relay-session init.)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            self._rng = jax.random.PRNGKey(seed)
        self._jit_cache: Dict[Any, Any] = {}

    # -- construction -------------------------------------------------------

    @classmethod
    def from_config(cls, config, ckpt: Optional[str] = None, seed: int = 0,
                    compute_dtype=jnp.float32, init_shape=(1, 9, 64, 64)):
        cfg = load_config(config)
        model_cfg = cfg.get("model", cfg)
        core, meta = build_core_from_config(model_cfg)
        ckpt = ckpt or (model_cfg.get("params", {}) or {}).get("ckpt_path")
        if ckpt:
            from ..utils.checkpoint import load_params

            params = load_params(
                ckpt, core, meta,
                ignore_keys=tuple((model_cfg.get("params", {}) or {})
                                  .get("ignore_keys", ()) or ()))
        else:
            t, h, w = init_shape[1], init_shape[2], init_shape[3]
            # Run the init graph on the host CPU backend: param init is a
            # one-shot tiny-shape program, and on the axon TPU relay its
            # compile+execute costs minutes of wall per fresh process
            # (measured 416s for the flagship — tools/probe_relay_compile.py).
            # Params transfer to the accelerator lazily at first real call.
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                x = jnp.zeros((init_shape[0], t, h, w, core.encoder.in_channels),
                              jnp.float32)
                variables = core.init(
                    {"params": jax.random.PRNGKey(seed),
                     "sample": jax.random.PRNGKey(0)},
                    x, sample_override=False,
                )
                params = variables["params"]
        return cls(core, params, meta, compute_dtype=compute_dtype, seed=seed)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def save(self, path: str):
        """Save params to a native .npz (loadable via ckpt= in from_config)."""
        from ..utils.checkpoint import save_params

        save_params(path, self.params)

    # -- jit helpers --------------------------------------------------------

    def _full_forward_fn(self, sample: bool, fused: bool = False):
        def fn(params, x, rng):
            xt = _to_nthwc(x).astype(self.compute_dtype)
            z, dec, log = self.core.apply(
                {"params": params}, xt, sample_override=sample, fused=fused,
                rngs={"sample": rng},
            )
            return (
                _to_ncthw(z.astype(jnp.float32)),
                _to_ncthw(dec.astype(jnp.float32)),
                log,
            )

        return fn

    # -- public API ---------------------------------------------------------

    def encode(self, x, return_reg_log: bool = False, sample: bool = False):
        """x: [B,C,T,H,W] -> z [B,Cz,T',H',W'] (+ reg_log)."""
        x = jnp.asarray(x)
        if self.use_tiling:
            z, log = self._tile_encode(x, sample)
        else:
            key = ("encode", x.shape, sample)
            if key not in self._jit_cache:
                def fn(params, xx, rng):
                    xt = _to_nthwc(xx).astype(self.compute_dtype)
                    z, log = self.core.apply(
                        {"params": params}, xt, sample_override=sample,
                        fused=self.fused,
                        rngs={"sample": rng}, method=TokenizerCore.encode,
                    )
                    return _to_ncthw(z.astype(jnp.float32)), log
                self._jit_cache[key] = jax.jit(fn)
            z, log = self._jit_cache[key](self.params, x, self._next_rng())
        if return_reg_log:
            return z, log
        return z

    def decode(self, z, decode_from_indices: bool = False):
        z = jnp.asarray(z)
        if decode_from_indices:
            z = self.indices_to_latent(z)
        if self.use_tiling:
            return self._tile_decode(z)
        key = ("decode", z.shape)
        if key not in self._jit_cache:
            def fn(params, zz):
                zt = _to_nthwc(zz).astype(self.compute_dtype)
                dec = self.core.apply(
                    {"params": params}, zt, fused=self.fused,
                    method=TokenizerCore.decode,
                )
                return _to_ncthw(dec.astype(jnp.float32))
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](self.params, z)

    def indices_to_latent(self, indices):
        """[B,T',H',W'] int32 -> [B,Cz,T',H',W'] (FSQ only)."""
        key = ("i2l", indices.shape)
        if key not in self._jit_cache:
            def fn(params, idx):
                z = self.core.apply(
                    {"params": params}, idx, method=TokenizerCore.decode_indices,
                )
                return _to_ncthw(z)
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](self.params, jnp.asarray(indices))

    def forward(self, x, sample: bool = False):
        """(z, x_rec, reg_log) — reference forward (autoencoder.py:221-229)."""
        x = jnp.asarray(x)
        if self.use_tiling:
            z, log = self._tile_encode(x, sample)
            dec = self._tile_decode(z)
            if dec.shape[2] != x.shape[2]:
                dec = dec[:, :, -x.shape[2]:]
            return z, dec, log
        key = ("forward", x.shape, sample)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                self._full_forward_fn(sample, fused=self.fused))
        return self._jit_cache[key](self.params, x, self._next_rng())

    __call__ = forward

    # -- multi-chip sharded inference ---------------------------------------
    # TPU-native extension (SURVEY §2.5): shard the frame HEIGHT across the
    # mesh's devices for single-video latency scaling. XLA's SPMD partitioner
    # inserts the conv halo exchanges (collective-permutes over ICI)
    # automatically — no manual communication code.

    def forward_sharded(self, x, mesh, sample: bool = False):
        """Full forward with H sharded over all mesh devices.

        x: [B,C,T,H,W]; mesh: a Mesh whose total device count divides H/8.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = tuple(mesh.axis_names)
        key = ("forward_sharded", x.shape, sample, id(mesh))
        if key not in self._jit_cache:
            # fused=False: GSPMD cannot insert halo exchanges around
            # pallas custom calls, so the H-sharded graph must use the XLA
            # convs (whose halos the partitioner handles automatically).
            fn = self._full_forward_fn(sample, fused=False)
            x_sharding = NamedSharding(mesh, P(None, None, None, axes, None))
            rep = NamedSharding(mesh, P())
            self._jit_cache[key] = jax.jit(
                fn, in_shardings=(rep, x_sharding, rep))
        # params are placed once per mesh and reused across calls (a per-call
        # device_put would re-push the full tree over PCIe every step)
        pkey = ("sharded_params", id(mesh))
        if pkey not in self._jit_cache:
            self._jit_cache[pkey] = jax.device_put(
                self.params, NamedSharding(mesh, P()))
        xs = jax.device_put(jnp.asarray(x),
                            NamedSharding(mesh, P(None, None, None, axes,
                                                  None)))
        return self._jit_cache[key](self._jit_cache[pkey], xs,
                                    self._next_rng())

    # -- tiled / streaming inference ----------------------------------------
    # Reference: autoencoder_v1_1.py:218-331. Chunk schedule: first chunk is
    # a single frame (anchors the causal stream), then steps of t_chunk.

    def build_chunk_start_end(self, t, decoder_mode=False):
        chunk = self.t_chunk_dec if decoder_mode else self.t_chunk_enc
        start_end = [[0, 1]]
        start = 1
        while start < t:
            end = min(t, start + chunk)
            start_end.append([start, end])
            start = end
        return start_end

    def _stream_encode_fns(self, chunk_shape, first_shape, sample):
        key = ("stream_enc", chunk_shape, first_shape, sample)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def first_fn(params, x, rng):
            xt = _to_nthwc(x).astype(self.compute_dtype)
            xt = self.core.encoder.pad_input(xt)
            (z, log), vars_ = self.core.apply(
                {"params": params}, xt, streaming=True, first_chunk=True,
                sample_override=sample, fused=self.fused_streaming,
                rngs={"sample": rng},
                method=TokenizerCore.encode, mutable=["cache"],
            )
            return z, log, vars_["cache"]

        def step_fn(params, cache, x, rng):
            xt = _to_nthwc(x).astype(self.compute_dtype)
            (z, log), vars_ = self.core.apply(
                {"params": params, "cache": cache}, xt, streaming=True,
                first_chunk=False, sample_override=sample, fused=self.fused_streaming,
                rngs={"sample": rng},
                method=TokenizerCore.encode, mutable=["cache"],
            )
            return z, log, vars_["cache"]

        fns = (jax.jit(first_fn), jax.jit(step_fn))
        self._jit_cache[key] = fns
        return fns

    # -- lax.scan streaming: the whole chunk loop is ONE compiled graph.
    # The causal cache pytree (fixed shapes, independent of chunk count) is
    # the scan carry; chunk k's latents stream out as stacked ys. Used when
    # the video length is chunk-aligned (T = 1 + k*t_chunk); the per-chunk
    # jit path below handles ragged tails and reuses its compiled step for
    # ANY video length without recompilation.

    def _scan_encode_fn(self, k, sample):
        key = ("scan_enc", k, sample)
        if key in self._jit_cache:
            return self._jit_cache[key]
        chunk = self.t_chunk_enc

        def fn(params, x, rng):
            # x: [B, C, 1 + k*chunk, H, W]
            xt = _to_nthwc(x).astype(self.compute_dtype)
            first = self.core.encoder.pad_input(xt[:, :1])
            rngs = jax.random.split(rng, k + 1)
            (z0, log0), vars_ = self.core.apply(
                {"params": params}, first, streaming=True, first_chunk=True,
                sample_override=sample, fused=self.fused_streaming,
                rngs={"sample": rngs[0]},
                method=TokenizerCore.encode, mutable=["cache"],
            )
            rest = xt[:, 1:]
            b, _, h, w, c = xt.shape
            chunks = rest.reshape(b, k, chunk, h, w, c)
            chunks = jnp.moveaxis(chunks, 1, 0)  # [k, B, chunk, H, W, C]

            def step(cache, inp):
                xc, key_i = inp
                (z, log), vs = self.core.apply(
                    {"params": params, "cache": cache}, xc, streaming=True,
                    first_chunk=False, sample_override=sample,
                    fused=self.fused_streaming, rngs={"sample": key_i},
                    method=TokenizerCore.encode, mutable=["cache"],
                )
                return vs["cache"], (z, log)

            _, (zs, logs) = jax.lax.scan(step, vars_["cache"],
                                         (chunks, rngs[1:]))
            # zs: [k, B, chunk', h', w', cz] -> concat on time
            zk = jnp.moveaxis(zs, 0, 1)
            zk = zk.reshape(zk.shape[0], -1, *zk.shape[3:])
            z = jnp.concatenate([z0, zk], axis=1)
            if self.discrete:
                log = {
                    "aux_loss": (log0["aux_loss"] + jnp.sum(logs["aux_loss"]))
                    / (k + 1),
                    "indices": jnp.concatenate(
                        [log0["indices"],
                         jnp.moveaxis(logs["indices"], 0, 1).reshape(
                             z.shape[0], -1, *logs["indices"].shape[3:])],
                        axis=1),
                }
            else:
                log = {"kl_loss": (log0["kl_loss"] + jnp.sum(logs["kl_loss"]))
                       / (k + 1)}
            return _to_ncthw(z.astype(jnp.float32)), log

        self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _scan_decode_fn(self, k, use_overlap):
        """k = number of full-size latent chunks after the first (the last
        one has no lookahead)."""
        key = ("scan_dec", k, use_overlap)
        if key in self._jit_cache:
            return self._jit_cache[key]
        chunk = self.t_chunk_dec
        tdf = self.time_downsample_factor

        def fn(params, z):
            zt = _to_nthwc(z).astype(self.compute_dtype)
            b = zt.shape[0]
            t = zt.shape[1]

            def run(cache, zc, first):
                variables = {"params": params}
                if cache is not None:
                    variables["cache"] = cache
                dec, vs = self.core.apply(
                    variables, zc, streaming=True, first_chunk=first,
                    use_cache_offset=use_overlap, fused=self.fused_streaming,
                    method=TokenizerCore.decode, mutable=["cache"],
                )
                return dec, vs["cache"]

            first_overlap = use_overlap and t >= 2
            z0 = zt[:, : 1 + (1 if first_overlap else 0)]
            d0, cache = run(None, z0, True)
            if first_overlap:
                d0 = d0[:, : d0.shape[1] - tdf]
            outs = [d0]
            if k > 1:
                width = chunk + (1 if use_overlap else 0)
                mids = jnp.stack([
                    zt[:, 1 + i * chunk : 1 + i * chunk + width]
                    for i in range(k - 1)])

                def step(cache, zc):
                    dec, c2 = run(cache, zc, False)
                    if use_overlap:
                        dec = dec[:, : dec.shape[1] - tdf]
                    return c2, dec

                cache, ds = jax.lax.scan(step, cache, mids)
                dm = jnp.moveaxis(ds, 0, 1).reshape(b, -1, *ds.shape[3:])
                outs.append(dm)
            if k > 0:
                zl = zt[:, 1 + (k - 1) * chunk :]
                dl, _ = run(cache, zl, False)
                outs.append(dl)
            out = jnp.concatenate(outs, axis=1)
            return _to_ncthw(out.astype(jnp.float32))

        self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def encode_streaming_scan(self, x, sample: bool = False):
        """Whole-video tiled encode as a single compiled lax.scan program.

        Requires T == 1 + k * t_chunk_enc (the shape VidTokValDataset's
        read_long_video mode produces, reference vidtok.py:220-233)."""
        x = jnp.asarray(x)
        t = x.shape[2]
        k, rem = divmod(t - 1, self.t_chunk_enc)
        assert rem == 0, f"T={t} not 1 + k*{self.t_chunk_enc}"
        return self._scan_encode_fn(k, sample)(self.params, x,
                                               self._next_rng())

    def decode_streaming_scan(self, z):
        z = jnp.asarray(z)
        t = z.shape[2]
        k, rem = divmod(t - 1, self.t_chunk_dec)
        assert rem == 0, f"T'={t} not 1 + k*{self.t_chunk_dec}"
        return self._scan_decode_fn(k, self.use_overlap)(self.params, z)

    def _check_tiling_supported(self):
        if self.meta.get("variant") == "causal":
            raise ValueError(
                "tiled/streaming inference requires a v1.1 model "
                "(causal_v1_1); the v1.0 decoder crops warmup frames per "
                "call, which breaks chunk stitching (reference only "
                "implements tiling in autoencoder_v1_1.py)")

    def _tile_encode(self, x, sample=False):
        self._check_tiling_supported()
        b, c, t, h, w = x.shape
        start_end = self.build_chunk_start_end(t)
        first_fn = step_fn = None
        zs, logs = [], []
        cache = None
        for idx, (s, e) in enumerate(start_end):
            chunk = x[:, :, s:e]
            if idx == 0:
                first_fn, step_fn = self._stream_encode_fns(
                    (b, c, self.t_chunk_enc, h, w), chunk.shape, sample)
                z, log, cache = first_fn(self.params, chunk, self._next_rng())
            else:
                z, log, cache = step_fn(self.params, cache, chunk, self._next_rng())
            zs.append(z)
            logs.append(log)
        z = jnp.concatenate(zs, axis=1)
        if self.discrete:
            log = {
                "aux_loss": jnp.mean(jnp.stack([l["aux_loss"] for l in logs])),
                "indices": jnp.concatenate([l["indices"] for l in logs], axis=1),
            }
        else:
            log = {"kl_loss": jnp.mean(jnp.stack([l["kl_loss"] for l in logs]))}
        return _to_ncthw(z.astype(jnp.float32)), log

    def _stream_decode_fns(self, use_overlap):
        key = ("stream_dec", use_overlap)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def make(first_chunk):
            def fn(params, cache, z):
                zt = _to_nthwc(z).astype(self.compute_dtype)
                variables = {"params": params}
                if cache is not None:
                    variables["cache"] = cache
                dec, vars_ = self.core.apply(
                    variables, zt, streaming=True, first_chunk=first_chunk,
                    use_cache_offset=use_overlap, fused=self.fused_streaming,
                    method=TokenizerCore.decode, mutable=["cache"],
                )
                return dec, vars_["cache"]

            return jax.jit(fn)

        fns = (make(True), make(False))
        self._jit_cache[key] = fns
        return fns

    def _tile_decode(self, z):
        b, cz, t, h, w = z.shape
        start_end = self.build_chunk_start_end(t, decoder_mode=True)
        first_fn, step_fn = self._stream_decode_fns(self.use_overlap)
        tdf = self.time_downsample_factor
        outs = []
        cache = None
        for idx, (s, e) in enumerate(start_end):
            overlap = self.use_overlap and (e + 1 <= t)
            chunk_z = z[:, :, s : e + 1] if overlap else z[:, :, s:e]
            if idx == 0:
                dec, cache = first_fn(self.params, None, chunk_z)
            else:
                dec, cache = step_fn(self.params, cache, chunk_z)
            if overlap:
                dec = dec[:, : dec.shape[1] - tdf]
            outs.append(dec)
        out = jnp.concatenate(outs, axis=1)
        return _to_ncthw(out.astype(jnp.float32))
