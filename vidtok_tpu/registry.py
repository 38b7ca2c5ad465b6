"""Component registry + config-driven instantiation.

The reference wires everything through arbitrary import reflection
(`instantiate_from_config`, reference vidtok/modules/util.py:69-86). We keep
the same YAML shape (`target:` / `params:`) so reference configs translate
1:1, but resolve targets through an explicit registry first (safer, and lets
reference dotted paths alias to our TPU-native classes).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Any] = {}

# Reference dotted paths -> our registry names, so unmodified reference YAML
# configs load directly.
_ALIASES = {
    "vidtok.models.autoencoder.AutoencodingEngine": "AutoencodingEngine",
    "vidtok.models.autoencoder_v1_1.AutoencodingEngine": "AutoencodingEngineV1_1",
    "vidtok.modules.model_3dcausal.EncoderCausal3DPadding": "EncoderCausal3D",
    "vidtok.modules.model_3dcausal.DecoderCausal3DPadding": "DecoderCausal3D",
    "vidtok.modules.model_3dcausal_v1_1.EncoderCausal3DPadding": "EncoderCausal3DV1_1",
    "vidtok.modules.model_3dcausal_v1_1.DecoderCausal3DPadding": "DecoderCausal3DV1_1",
    "vidtok.modules.model_3dnoncausal.Encoder3D": "Encoder3D",
    "vidtok.modules.model_3dnoncausal.Decoder3D": "Decoder3D",
    "vidtok.modules.regularizers.DiagonalGaussianRegularizer": "DiagonalGaussianRegularizer",
    "vidtok.modules.regularizers.FSQRegularizer": "FSQRegularizer",
    "vidtok.modules.losses.GeneralLPIPSWithDiscriminator": "GeneralLPIPSWithDiscriminator",
    "vidtok.data.datamodule.DataModuleFromConfig": "DataModuleFromConfig",
    "vidtok.data.vidtok.VidTokDataset": "VidTokDataset",
    "vidtok.data.vidtok.VidTokValDataset": "VidTokValDataset",
    "vidtok.modules.logger.ImageVideoLogger": "ImageVideoLogger",
    "vidtwin.models.vidtwin_ae.VidAutoEncoderQformerCompactSymVidVAE": "VidTwinVAE",
    "vidtwin.modules.st_transformer.STTEncoder": "STTEncoder",
    "vidtwin.modules.st_transformer.STTDecoder": "STTDecoder",
    "vidtwin.modules.qformer.MyQformerInterface": "QFormerInterface",
}


def register(name: str = None) -> Callable:
    """Class decorator: `@register()` or `@register("Name")`."""

    def deco(cls):
        key = name or cls.__name__
        _REGISTRY[key] = cls
        return cls

    return deco


# Lazily-imported built-in components (name -> defining module).
_LAZY = {
    "VidTokDataset": "vidtok_tpu.data.dataset",
    "VidTokValDataset": "vidtok_tpu.data.dataset",
    "DataModuleFromConfig": "vidtok_tpu.data.datamodule",
    "Encoder": "vidtok_tpu.modules.encoder",
    "Decoder": "vidtok_tpu.modules.decoder",
    "DiagonalGaussianRegularizer": "vidtok_tpu.modules.regularizers",
    "FSQRegularizer": "vidtok_tpu.modules.regularizers",
    "NLayerDiscriminator": "vidtok_tpu.modules.discriminator",
    "NLayerDiscriminator3D": "vidtok_tpu.modules.discriminator",
    "LPIPS": "vidtok_tpu.modules.lpips",
}


def resolve(target: str) -> Any:
    """Resolve a `target:` string to a class/callable."""
    target = _ALIASES.get(target, target)
    if target in _REGISTRY:
        return _REGISTRY[target]
    if target in _LAZY:
        mod = importlib.import_module(_LAZY[target])
        obj = getattr(mod, target)
        _REGISTRY[target] = obj
        return obj
    # Fall back to dotted import within our own package namespace only.
    if "." in target:
        return get_obj_from_str(target)
    raise KeyError(
        f"Unknown target {target!r}. Registered: {sorted(_REGISTRY)}"
    )


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Import `pkg.mod.Obj` (reference util.py:79-86 semantics)."""
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: dict, **extra_kwargs) -> Any:
    """Build the object named by config['target'] with config['params'].

    Mirrors reference util.py:69-76.
    """
    if "target" not in config:
        raise KeyError(f"Expected 'target' key in config, got {list(config)}")
    cls = resolve(config["target"])
    params = dict(config.get("params") or {})
    params.update(extra_kwargs)
    return cls(**params)


def registered() -> Dict[str, Any]:
    return dict(_REGISTRY)
