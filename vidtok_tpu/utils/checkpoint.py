"""Checkpoint IO: native (orbax/msgpack) + torch state_dict conversion.

The released VidTok checkpoints are torch Lightning ``.ckpt`` / safetensors
files (reference autoencoder.py:146-176). ``convert_torch_state_dict``
maps their keys onto our flax param tree:

  torch module path                      flax path
  -------------------------------------  ---------------------------------
  encoder.down.{i}.block.{j}.*           encoder/down_{i}_block_{j}/*
  encoder.down_temporal.{i}.block.{j}.*  encoder/down_temporal_{i}_block_{j}/*
  encoder.down.{i}.downsample.*          encoder/down_{i}_downsample/*
  encoder.mid.block_1.*                  encoder/mid_block_1/*
  decoder.up.{i}.* / up_temporal         decoder/up_{i}_* etc.
  regularization.*                       regularizer/*

Weight layout transforms (torch -> JAX DHWIO):
  Conv3d [O,I,kt,kh,kw] -> [kt,kh,kw,I,O];  Conv2d [O,I,kh,kw] -> [1,kh,kw,I,O]
  Conv1d [O,I,k] -> [k,1,1,I,O];  Linear [O,I] -> [I,O];  norm w/b -> scale/bias

Causal-conv wrappers nest a ``.conv`` submodule and LayerNorm wrappers a
``.norm`` submodule in torch; both levels are flattened away here.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_CONV_WRAPPERS = {
    "conv_in", "conv_out", "conv1", "conv2", "nin_shortcut", "conv_shortcut",
    "q", "k", "v", "proj_out", "conv",
}
_NORM_NAMES = {"norm", "norm1", "norm2", "norm_out"}


def _fuse_structural_tokens(tokens):
    """[down, 0, block, 1, ...] -> [down_0_block_1, ...] etc."""
    out = []
    i = 0
    n = len(tokens)
    while i < n:
        t = tokens[i]
        if t in ("down", "up", "down_temporal", "up_temporal") and i + 1 < n and tokens[i + 1].isdigit():
            idx = tokens[i + 1]
            if i + 3 < n and tokens[i + 2] == "block" and tokens[i + 3].isdigit():
                out.append(f"{t}_{idx}_block_{tokens[i + 3]}")
                i += 4
            elif i + 2 < n and tokens[i + 2] in ("downsample", "upsample"):
                out.append(f"{t}_{idx}_{tokens[i + 2]}")
                i += 3
            else:
                out.append(f"{t}_{idx}")
                i += 2
        elif t == "mid" and i + 1 < n and tokens[i + 1] in ("block_1", "block_2", "attn_1"):
            out.append(f"mid_{tokens[i + 1]}")
            i += 2
        else:
            out.append(t)
            i += 1
    return out


def _convert_array(path_tokens, arr: np.ndarray):
    """Return (new_leaf_name, transformed_array)."""
    leaf = path_tokens[-1]
    parent = path_tokens[-2] if len(path_tokens) >= 2 else ""
    if leaf == "mix_factor":
        return "mix_factor", arr.reshape(1).astype(np.float32)
    if leaf == "bias":
        return "bias", arr
    if leaf != "weight":
        return leaf, arr
    # weight:
    if arr.ndim == 5:  # Conv3d OIDHW
        return "kernel", np.transpose(arr, (2, 3, 4, 1, 0))
    if arr.ndim == 4:  # Conv2d OIHW -> (1,kh,kw,I,O)
        return "kernel", np.transpose(arr, (2, 3, 1, 0))[None]
    if arr.ndim == 3:  # Conv1d OIk -> (k,1,1,I,O)
        return "kernel", np.transpose(arr, (2, 1, 0))[:, None, None]
    if arr.ndim == 2:  # Linear
        return "kernel", np.transpose(arr, (1, 0))
    if arr.ndim == 1:  # norm affine
        return "scale", arr
    return "kernel", arr


def convert_torch_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Flat torch state_dict -> nested flax params for TokenizerCore.

    Ignores ``loss.*`` (training losses are converted separately) and
    non-persistent FSQ buffers.
    """
    params: dict = {}
    skipped = []
    for key, arr in sd.items():
        tokens = key.split(".")
        if tokens[0] == "loss":
            skipped.append(key)
            continue
        if tokens[0] == "model_ema":
            skipped.append(key)
            continue
        if tokens[0] == "regularization":
            tokens[0] = "regularizer"
        if tokens[-1] in ("_levels", "_basis", "implicit_codebook", "zero",
                          "global_codebook_usage"):
            skipped.append(key)
            continue
        tokens = _fuse_structural_tokens(tokens)
        # flatten torch wrapper levels: ...<convname>.conv.weight, <norm>.norm.weight
        clean = []
        for i, t in enumerate(tokens):
            if t == "conv" and clean and clean[-1] in _CONV_WRAPPERS:
                continue
            if t == "norm" and clean and clean[-1] in _NORM_NAMES:
                continue
            clean.append(t)
        arr = np.asarray(arr)
        leaf, arr = _convert_array(clean, arr)
        clean[-1] = leaf
        node = params
        for t in clean[:-1]:
            node = node.setdefault(t, {})
        node[clean[-1]] = arr
    return params


def validate_params(converted: dict, reference: dict, path=""):
    """Compare a converted tree against model-initialized params; returns
    (missing, unexpected, mismatched) key lists."""
    missing, unexpected, mismatched = [], [], []

    def walk(c, r, p):
        ck = set(c) if isinstance(c, dict) else set()
        rk = set(r) if isinstance(r, dict) else set()
        for k in rk - ck:
            missing.append(f"{p}/{k}")
        for k in ck - rk:
            unexpected.append(f"{p}/{k}")
        for k in ck & rk:
            cv, rv = c[k], r[k]
            if isinstance(rv, dict):
                walk(cv if isinstance(cv, dict) else {}, rv, f"{p}/{k}")
            else:
                if np.shape(cv) != np.shape(rv):
                    mismatched.append(f"{p}/{k}: {np.shape(cv)} vs {np.shape(rv)}")

    walk(converted, reference, path)
    return missing, unexpected, mismatched


_DISC_SEQ_NAMES = {0: "conv0", 2: "conv1", 3: "norm1", 5: "conv2",
                   6: "norm2", 8: "conv3", 9: "norm3", 11: "conv_out"}


def convert_discriminator_state_dict(sd: Dict[str, np.ndarray],
                                     prefix: str = "loss.discriminator."):
    """torch NLayerDiscriminator(3D) Sequential -> (params, batch_stats).

    Reference discriminator.py:88-201: main.{i} indices map per
    ``_DISC_SEQ_NAMES`` (conv/BN interleaved with parameter-free LeakyReLU).
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, name, leaf, arr):
        tree.setdefault(name, {})[leaf] = np.asarray(arr)

    for key, arr in sd.items():
        if not key.startswith(prefix):
            continue
        tokens = key[len(prefix):].split(".")
        if tokens[0] != "main":
            continue
        name = _DISC_SEQ_NAMES[int(tokens[1])]
        leaf = tokens[2]
        arr = np.asarray(arr)
        if name.startswith("conv"):
            if leaf == "weight":
                if arr.ndim == 4:  # Conv2d OIHW -> HWIO
                    put(params, name, "kernel", np.transpose(arr, (2, 3, 1, 0)))
                else:  # Conv3d OIDHW -> DHWIO
                    put(params, name, "kernel",
                        np.transpose(arr, (2, 3, 4, 1, 0)))
            else:
                put(params, name, "bias", arr)
        else:  # BatchNorm, or ActNorm when use_actnorm (discriminator.py:16-85)
            if leaf == "weight":
                put(params, name, "scale", arr)
            elif leaf == "bias":
                put(params, name, "bias", arr)
            elif leaf == "running_mean":
                put(stats, name, "mean", arr)
            elif leaf == "running_var":
                put(stats, name, "var", arr)
            elif leaf in ("loc", "scale"):  # ActNorm [1,C,1,1] -> [C]
                put(params, name, leaf, arr.reshape(-1))
            # ActNorm's "initialized" buffer is an in-place-init artifact
            # with no functional counterpart; dropped.
    return params, stats


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith("safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    # torch .ckpt — use torch if available, else raise
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_params(path: str, core=None, meta=None, verbose: bool = True,
                ignore_keys=()):
    """Load params from a native .npz/.msgpack or a torch .ckpt/.safetensors.

    ``ignore_keys``: regex patterns matched (re.match) against torch
    state_dict keys to drop before conversion (reference init_from_ckpt,
    autoencoder.py:146-176)."""
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        if any("//" in k for k in flat):  # full-checkpoint npz: core section
            return load_full_npz(path)["core"]
        return unflatten_params(flat)
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    sd = load_torch_state_dict(path)
    if ignore_keys:
        pats = [re.compile(p) for p in ignore_keys]
        dropped = [k for k in sd if any(p.match(k) for p in pats)]
        for k in dropped:
            del sd[k]
        if verbose and dropped:
            print(f"[checkpoint] deleted {len(dropped)} keys matching "
                  f"ignore_keys (first: {dropped[0]})")
    params = convert_torch_state_dict(sd)
    if core is not None and verbose:
        try:
            import jax as _jax

            x = jnp.zeros((1, 5, 32, 32, core.encoder.in_channels))
            ref = core.init({"params": _jax.random.PRNGKey(0),
                             "sample": _jax.random.PRNGKey(0)}, x,
                            sample_override=False)["params"]
            missing, unexpected, mismatched = validate_params(params, ref)
            print(f"[checkpoint] restored from {path} with {len(missing)} "
                  f"missing and {len(unexpected)} unexpected keys")
            for name, items in (("missing", missing),
                                ("unexpected", unexpected),
                                ("mismatched", mismatched)):
                if items:
                    print(f"[checkpoint] {name}: {items[:8]}"
                          f"{' ...' if len(items) > 8 else ''}")
        except Exception:
            pass
    return jax.tree_util.tree_map(jnp.asarray, params)


def flatten_params(params: dict, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    params: dict = {}
    for key, arr in flat.items():
        tokens = key.split("/")
        node = params
        for t in tokens[:-1]:
            node = node.setdefault(t, {})
        node[tokens[-1]] = jnp.asarray(arr)
    return params


def save_params(path: str, params: dict):
    flat = flatten_params(jax.device_get(params))
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


# ---------------------------------------------------------------------------
# Full-checkpoint conversion (every trainable section of a released
# Lightning .ckpt: core + loss.logvar + discriminator + LitEma shadows)
# ---------------------------------------------------------------------------


def convert_full_checkpoint(sd: Dict[str, np.ndarray]) -> dict:
    """Lightning .ckpt state_dict -> every section our trainer uses.

    Returns a dict with keys (absent when the source lacks them):
      core        nested flax params for TokenizerCore
      logvar      the learned loss.logvar scalar (losses.py, learn_logvar)
      disc_params / disc_stats   NLayerDiscriminator(3D) params+batch stats
      ema_core / ema_logvar      LitEma shadow params, mapped back through
                                 the same transforms as their sources
      ema_num_updates            LitEma step counter

    LitEma buffer names are source param names with '.' stripped
    (reference vidtok/modules/ema.py:19-23); the inverse mapping is
    reconstructed from the non-EMA keys, which is exact because LitEma
    shadows precisely the requires-grad params of the same module.
    """
    out = {"core": convert_torch_state_dict(sd)}
    if "loss.logvar" in sd:
        out["logvar"] = np.asarray(sd["loss.logvar"]).reshape(())
    if any(k.startswith("loss.discriminator.") for k in sd):
        dp, ds = convert_discriminator_state_dict(sd)
        out["disc_params"], out["disc_stats"] = dp, ds

    ema = {k[len("model_ema."):]: np.asarray(v) for k, v in sd.items()
           if k.startswith("model_ema.")}
    if ema:
        if "num_updates" in ema:
            out["ema_num_updates"] = int(ema.pop("num_updates"))
        ema.pop("decay", None)
        sname_to_key = {k.replace(".", ""): k for k in sd
                        if not k.startswith("model_ema.")}
        shadow_sd = {}
        unmatched = []
        for sname, arr in ema.items():
            key = sname_to_key.get(sname)
            if key is None:
                unmatched.append(sname)
            else:
                shadow_sd[key] = arr
        if unmatched:
            print(f"[checkpoint] {len(unmatched)} EMA shadows had no source "
                  f"param (first: {unmatched[0]}) — dropped")
        out["ema_core"] = convert_torch_state_dict(shadow_sd)
        if "loss.logvar" in shadow_sd:
            out["ema_logvar"] = np.asarray(shadow_sd["loss.logvar"]).reshape(())
    return out


def save_full_npz(path: str, sections: dict):
    """Write convert_full_checkpoint output as one flat .npz.

    Tree sections flatten with a ``<section>//`` prefix; scalars save
    directly. ``load_params`` on such a file returns the core tree (so the
    file drops into ``ckpt_path``); ``load_full_npz`` returns everything.
    """
    flat: Dict[str, np.ndarray] = {}
    for name, val in sections.items():
        if isinstance(val, dict):
            for k, a in flatten_params(val).items():
                flat[f"{name}//{k}"] = a
        else:
            flat[name] = np.asarray(val)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_full_npz(path: str) -> dict:
    raw = dict(np.load(path, allow_pickle=False))
    sections: dict = {}
    for key, arr in raw.items():
        if "//" in key:
            name, sub = key.split("//", 1)
            sections.setdefault(name, {})[sub] = arr
        else:
            sections[key] = arr
    for name, val in list(sections.items()):
        if isinstance(val, dict):
            sections[name] = unflatten_params(val)
    return sections


# ---------------------------------------------------------------------------
# Orbax train-state checkpointing (reference: Lightning ModelCheckpoint,
# main.py:861-880 + auto-resume main.py:687-727)
# ---------------------------------------------------------------------------


def _monitor_ledger_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "monitor.json")


def load_monitor_ledger(ckpt_dir: str) -> Dict[int, float]:
    """step -> monitor value for checkpoints saved with a monitor."""
    import json

    p = _monitor_ledger_path(ckpt_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return {int(k): float(v) for k, v in json.load(f).items()}


def _save_monitor_ledger(ckpt_dir: str, ledger: Dict[int, float]):
    import json

    with open(_monitor_ledger_path(ckpt_dir), "w") as f:
        json.dump({str(k): v for k, v in sorted(ledger.items())}, f)


def save_train_state(ckpt_dir: str, state, step: int, keep: int = 3,
                     monitor_value=None):
    """Save + prune (reference ModelCheckpoint, main.py:861-880).

    Retention mirrors Lightning's ``ModelCheckpoint(save_top_k=keep,
    monitor='val/rec_loss', mode='min', save_last=True)``: when any
    checkpoint has been saved with ``monitor_value``, keep the best ``keep``
    by monitor (lower is better) plus the newest (save_last); otherwise fall
    back to keeping the newest ``keep`` by step."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)

    ledger = load_monitor_ledger(ckpt_dir)
    if monitor_value is not None:
        ledger[step] = float(monitor_value)

    steps = sorted(all_checkpoint_steps(ckpt_dir))
    if ledger:
        by_monitor = sorted((s for s in steps if s in ledger),
                            key=lambda s: (ledger[s], -s))
        keep_set = set(by_monitor[:keep]) | {max(steps)}
    else:
        keep_set = set(steps[-keep:])
    for s in steps:
        if s not in keep_set:
            import shutil

            shutil.rmtree(os.path.join(ckpt_dir, f"step_{s:08d}"),
                          ignore_errors=True)
            ledger.pop(s, None)
    if monitor_value is not None or ledger:
        _save_monitor_ledger(ckpt_dir, ledger)
    return path


def best_checkpoint(ckpt_dir: str):
    """(path, step) of the best-by-monitor checkpoint, or (None, None)."""
    ledger = load_monitor_ledger(ckpt_dir)
    steps = set(all_checkpoint_steps(ckpt_dir))
    avail = [s for s in ledger if s in steps]
    if not avail:
        return None, None
    s = min(avail, key=lambda s: (ledger[s], -s))
    return os.path.abspath(os.path.join(ckpt_dir, f"step_{s:08d}")), s


def all_checkpoint_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"step_(\d+)$", name)
        if m:
            out.append(int(m.group(1)))
    return out


def latest_checkpoint(ckpt_dir: str):
    steps = all_checkpoint_steps(ckpt_dir)
    if not steps:
        return None, None
    s = max(steps)
    return os.path.abspath(os.path.join(ckpt_dir, f"step_{s:08d}")), s


def restore_train_state(path: str, abstract_state):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract_state)
