"""vidtok_tpu — a TPU-native (JAX/XLA/Pallas) video tokenizer framework.

A from-scratch rebuild of the capabilities of microsoft/VidTok (reference:
/root/reference) designed for TPU hardware: channels-last layouts, functional
streaming caches threaded through `jax.lax.scan`, sharding via `jax.sharding`
meshes, and Pallas kernels for the hot fused ops.

Public API mirrors the reference's de-facto library surface
(reference scripts/inference_evaluate.py:26-32):

    from vidtok_tpu import load_model_from_config
    model = load_model_from_config("configs/kl_causal_488_4chn.yaml", ckpt)
    z, xrec, reg_log = model(x)          # x: [B, C, T, H, W] in [-1, 1]
"""

__version__ = "0.1.0"

from .registry import register, instantiate_from_config, get_obj_from_str
from .config import load_config, merge_configs

__all__ = [
    "register",
    "instantiate_from_config",
    "get_obj_from_str",
    "load_config",
    "merge_configs",
    "load_model_from_config",
]


def load_model_from_config(config, ckpt=None, **kwargs):
    """Build a tokenizer engine from a YAML config path or config dict.

    Mirrors reference scripts/inference_evaluate.py:26-32 (the de-facto
    public API per reference README.md:324-349). Dispatches to the VidTwin
    engine when the model target is a VidTwin class.
    """
    from .config import load_config

    cfg = load_config(config)
    target = (cfg.get("model", cfg) or {}).get("target", "")
    if "VidTwin" in target or "vidtwin" in str(target):
        from .models.vidtwin.engine import VidTwinTokenizer

        kwargs.pop("compute_dtype", None)
        kwargs.pop("init_shape", None)
        return VidTwinTokenizer.from_config(cfg, ckpt=ckpt, **kwargs)
    from .models.autoencoder import VideoTokenizer

    return VideoTokenizer.from_config(cfg, ckpt=ckpt, **kwargs)
