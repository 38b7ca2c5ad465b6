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
            root = t[0]
            # unused in the reference forward: encoder.final_layer and
            # decoder.x_embedder exist but are never called
            if (root, t[1]) in (("encoder", "final_layer"),
                                ("decoder", "x_embedder")):
                continue
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
                    continue  # no-affine LayerNorm
                else:  # linear
                    put([root, "final_layer", "linear"],
                        "kernel" if t[-1] == "weight" else "bias",
                        _linear(arr) if t[-1] == "weight" else arr)
            continue

        # ---- Q-Former -----------------------------------------------------
        if t[0] == "temporal_qformer":
            if t[1] == "query_embeds":
                put(["qformer"], "query_embeds", arr)
                continue
            assert t[1] == "qformer"
            if t[2] == "layernorm":
                put(["qformer", "layernorm"],
                    "scale" if t[-1] == "weight" else "bias", arr)
                continue
            # encoder.layer.{i}....
            i = t[4]
            rest = t[5:]
            base = ["qformer", f"layer_{i}"]
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
