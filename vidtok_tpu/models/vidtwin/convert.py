"""torch -> flax weight conversion for VidTwin checkpoints.

Maps the reference ``VidAutoEncoderQformerCompactSymVidVAE`` state_dict
(vidtwin/models/vidtwin_ae.py:1220-1479 + st_transformer/qformer modules)
onto our VidTwinVAE param tree. torch Sequential indices become named
modules (e.g. ``content_downsample_blocks.0`` -> ``content_down_0``).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _linear(w):
    return np.transpose(w, (1, 0))


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _map_stt_key(t, arr, put):
    """Map one ``encoder.* | decoder.*`` ST-transformer torch key
    (reference st_transformer.py STTEncoder/STTDecoder)."""
    root = t[0]
    # unused in the reference forward: encoder.final_layer and
    # decoder.x_embedder exist but are never called
    if (root, t[1]) in (("encoder", "final_layer"),
                        ("decoder", "x_embedder")):
        return
    if t[1] == "x_embedder":
        put([root, "x_embedder", "proj"],
            "kernel" if t[-1] == "weight" else "bias",
            _conv3d(arr) if t[-1] == "weight" else arr)
    elif t[1] == "blocks":
        i = t[2]
        rest = t[3:]
        base = [root, f"blocks_{i}"]
        if rest == ["scale_shift_table"]:
            put(base, "scale_shift_table", arr)
        elif rest[0] in ("attn", "attn_temp"):
            sub = rest[1]  # qkv | proj
            put(base + [rest[0], sub],
                "kernel" if rest[-1] == "weight" else "bias",
                _linear(arr) if rest[-1] == "weight" else arr)
        elif rest[0] == "mlp":
            put(base + ["mlp", rest[1]],
                "kernel" if rest[-1] == "weight" else "bias",
                _linear(arr) if rest[-1] == "weight" else arr)
    elif t[1] == "final_layer":
        if t[2] == "scale_shift_table":
            put([root, "final_layer"], "scale_shift_table", arr)
        elif t[2] == "norm_final":
            return  # no-affine LayerNorm
        else:  # linear
            put([root, "final_layer", "linear"],
                "kernel" if t[-1] == "weight" else "bias",
                _linear(arr) if t[-1] == "weight" else arr)


def _map_qformer_key(t, arr, put, flax_root):
    """Map one ``<prefix>.{query_embeds | qformer.encoder.layer.i...}`` torch
    key under the given flax submodule name (reference MyQformerInterface,
    qformer.py:624-634)."""
    if t[1] == "query_embeds":
        put([flax_root], "query_embeds", arr)
        return
    assert t[1] == "qformer", t
    if t[2] == "layernorm":
        put([flax_root, "layernorm"],
            "scale" if t[-1] == "weight" else "bias", arr)
        return
    # encoder.layer.{i}....
    i = t[4]
    rest = t[5:]
    base = [flax_root, f"layer_{i}"]
    if rest[0] in ("attention", "crossattention"):
        blk = rest[0]
        if rest[1] == "attention":  # q/k/v
            put(base + [blk, rest[2]],
                "kernel" if rest[-1] == "weight" else "bias",
                _linear(arr) if rest[-1] == "weight" else arr)
        else:  # output.dense / output.LayerNorm
            if rest[2] == "dense":
                put(base + [blk, "out_dense"],
                    "kernel" if rest[-1] == "weight" else "bias",
                    _linear(arr) if rest[-1] == "weight" else arr)
            else:
                put(base + [blk, "out_norm"],
                    "scale" if rest[-1] == "weight" else "bias", arr)
    elif rest[0] == "intermediate_query":
        put(base + ["intermediate"],
            "kernel" if rest[-1] == "weight" else "bias",
            _linear(arr) if rest[-1] == "weight" else arr)
    elif rest[0] == "output_query":
        if rest[1] == "dense":
            put(base + ["output"],
                "kernel" if rest[-1] == "weight" else "bias",
                _linear(arr) if rest[-1] == "weight" else arr)
        else:
            put(base + ["output_norm"],
                "scale" if rest[-1] == "weight" else "bias", arr)


def convert_vidtwin_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    params: dict = {}

    def put(path, leaf, arr):
        node = params
        for t in path:
            node = node.setdefault(t, {})
        node[leaf] = np.asarray(arr)

    for key, arr in sd.items():
        arr = np.asarray(arr)
        t = key.split(".")
        if t[0] in ("loss", "model_ema"):
            continue
        if t[-1] in ("pos_embed", "pos_embed_temporal"):
            continue  # computed sincos buffers

        # ---- ST transformer (encoder/decoder) ----------------------------
        if t[0] in ("encoder", "decoder"):
            _map_stt_key(t, arr, put)
            continue

        # ---- Q-Former -----------------------------------------------------
        if t[0] == "temporal_qformer":
            _map_qformer_key(t, arr, put, "qformer")
            continue

        # ---- glue convs / denses -----------------------------------------
        leaf = "kernel" if t[-1] == "weight" else "bias"

        def conv_or_bias(a):
            return _conv2d(a) if t[-1] == "weight" else a

        def lin_or_bias(a):
            return _linear(a) if t[-1] == "weight" else a

        if t[0] == "conv_in":
            put(["conv_in"], leaf, conv_or_bias(arr))
        elif t[0] == "content_downsample_blocks":
            put([f"content_down_{int(t[1]) // 2}"], leaf, conv_or_bias(arr))
        elif t[0] == "content_upsample_blocks":
            put([f"content_up_{int(t[1]) // 3}"], leaf, conv_or_bias(arr))
        elif t[0] == "bottle_down":
            put(["bottle_down"], leaf, conv_or_bias(arr))
        elif t[0] == "bottle_up":
            put(["bottle_up"], leaf, conv_or_bias(arr))
        elif t[0] == "conv_out":
            put(["conv_out"], leaf, conv_or_bias(arr))
        elif t[0] == "cont_emb":
            if t[1] == "0":
                put(["cont_emb_dense"], leaf, lin_or_bias(arr))
            elif t[1] == "2":  # Conv1d token mix [out, in, 1]
                put(["cont_emb_mix"], leaf,
                    arr[..., 0] if t[-1] == "weight" else arr)
        elif t[0] == "motion_emb":
            idx = {"0": "motion_emb_1", "2": "motion_emb_2"}[t[1]]
            put([idx], leaf, lin_or_bias(arr))
        elif t[0] == "motion_head":
            put(["motion_head"], leaf, conv_or_bias(arr))
        elif t[0] == "downsample_motion_module":
            put([f"motion_down_{int(t[1]) // 2}"], leaf, conv_or_bias(arr))
        elif t[0] == "up_motion":
            idx = {"0": "up_motion_1", "2": "up_motion_2"}[t[1]]
            put([idx], leaf, lin_or_bias(arr))
        elif t[0] in ("regularization",):
            continue  # DiagonalGaussianRegularizer has no params
        else:
            raise KeyError(f"unmapped vidtwin key: {key}")
    return params


# torch nn.Sequential index -> (flax leaf name, kind) for the ablation
# classes' embedding heads (reference vidtwin_ae.py:282-965).  kind:
# 'lin' Linear, 'mix' Conv1d token mix.
_EMBSEQ = {"0": ("dense", "lin"), "2": ("mix", "mix")}          # Lin,ReLU,Conv1d,ReLU
_EMBSEQ6 = {"0": ("dense_1", "lin"), "2": ("dense_2", "lin"),
            "4": ("mix", "mix")}                                 # Lin,ReLU,Lin,ReLU,Conv1d,ReLU


def convert_vidtwin_ablation_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """torch state_dict of a VidTwin ablation class
    (VidAutoEncoderQformer / Compact / Sym / SymDis / SymVid, reference
    vidtwin_ae.py:282-1216) -> flax params for the matching
    ``ablations.py`` module."""
    params: dict = {}

    def put(path, leaf, arr):
        node = params
        for tok in path:
            node = node.setdefault(tok, {})
        node[leaf] = np.asarray(arr)

    qformer_names = {
        "temporal_qformer": "temporal_qformer",
        "hight_qformer": "height_qformer",  # reference's typo'd attr (:326)
        "width_qformer": "width_qformer",
        "space_qformer": "space_qformer",
    }
    # Sequential heads: torch attr -> (flax submodule, index map).  EmbSeq
    # heads land as {name}/{dense|mix}; 6-element heads land flat as
    # {name}_{dense_1|dense_2|mix} to match the ablation modules' setup.
    embseq_heads = {
        "cont_emb": ("cont_emb", _EMBSEQ),
        "height_emb": ("height_emb", _EMBSEQ),
        "width_emb": ("width_emb", _EMBSEQ),
        "spatial_emb": ("spatial_emb", _EMBSEQ),
    }
    flat_heads = {
        "cont_emb": ("cont", _EMBSEQ6),
        "spatial_emb": ("spatial", _EMBSEQ6),
        "pre_spatial_qformer": ("pre_spatial", {"0": ("1", "lin"),
                                                "2": ("2", "lin")}),
    }

    # detect 6-element variants by the presence of index 4
    def head_map(name):
        if any(k.startswith(f"{name}.4.") for k in sd):
            root, m = flat_heads[name]
            return {i: (f"{root}_{leaf}", kind) for i, (leaf, kind) in m.items()}, True
        if name == "pre_spatial_qformer":
            root, m = flat_heads[name]
            return {i: (f"{root}_{leaf}", kind) for i, (leaf, kind) in m.items()}, True
        sub, m = embseq_heads[name]
        return m, False

    for key, arr in sd.items():
        arr = np.asarray(arr)
        t = key.split(".")
        if t[0] in ("loss", "model_ema", "regularization"):
            continue
        if t[-1] in ("pos_embed", "pos_embed_temporal"):
            continue
        if t[0] in ("encoder", "decoder"):
            _map_stt_key(t, arr, put)
            continue
        if t[0] in qformer_names:
            _map_qformer_key(t, arr, put, qformer_names[t[0]])
            continue

        leaf = "kernel" if t[-1] == "weight" else "bias"

        def conv_or_bias(a):
            return _conv2d(a) if t[-1] == "weight" else a

        def lin_or_bias(a):
            return _linear(a) if t[-1] == "weight" else a

        if t[0] in ("cont_emb", "height_emb", "width_emb", "spatial_emb",
                    "pre_spatial_qformer"):
            m, flat = head_map(t[0])
            name, kind = m[t[1]]
            path = [name] if flat else [embseq_heads[t[0]][0], name]
            if kind == "mix":
                put(path, leaf, arr[..., 0] if t[-1] == "weight" else arr)
            else:
                put(path, leaf, lin_or_bias(arr))
        elif t[0] == "pre_temporal_qformer":
            put(["pre_temporal_qformer"], leaf, lin_or_bias(arr))  # index 0
        elif t[0] in ("down_channel_temp", "up_channel_temp"):
            put([t[0]], leaf, lin_or_bias(arr))
        elif t[0] == "conv_in":
            put(["conv_in"], leaf, conv_or_bias(arr))
        elif t[0] == "content_downsample_blocks":
            put([f"content_down_{int(t[1]) // 2}"], leaf, conv_or_bias(arr))
        elif t[0] == "content_upsample_blocks":
            put([f"content_up_{int(t[1]) // 3}"], leaf, conv_or_bias(arr))
        elif t[0] in ("bottle_down", "bottle_up", "conv_out"):
            put([t[0]], leaf, conv_or_bias(arr))
        else:
            raise KeyError(f"unmapped vidtwin ablation key: {key}")
    return params
