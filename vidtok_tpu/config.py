"""YAML config runtime.

Replaces the reference's OmegaConf usage (reference main.py:756-783) with a
small self-contained implementation supporting the subset the config corpus
actually uses:

  * left-to-right deep merge of multiple YAML files
  * CLI dotlist overrides (``nested.key=value``)
  * ``${a.b.c}`` interpolation (e.g. decoder aliasing encoder params,
    reference configs/vidtok_kl_causal_488_4chn.yaml:31)
"""

from __future__ import annotations

import copy
import re
from typing import Any, List, Union

import yaml

_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")


def load_config(path_or_dict: Union[str, dict]) -> dict:
    if isinstance(path_or_dict, dict):
        cfg = copy.deepcopy(path_or_dict)
    else:
        with open(path_or_dict) as f:
            cfg = yaml.safe_load(f) or {}
    return resolve_interpolations(cfg)


def merge_configs(*configs: Union[str, dict], dotlist: List[str] = ()) -> dict:
    """Deep-merge configs left-to-right, then apply dotlist overrides."""
    out: dict = {}
    for c in configs:
        if isinstance(c, str):
            with open(c) as f:
                c = yaml.safe_load(f) or {}
        out = _deep_merge(out, c)
    for item in dotlist:
        key, _, value = item.partition("=")
        _set_dotted(out, key.strip(), yaml.safe_load(value))
    return resolve_interpolations(out)


def _deep_merge(base: dict, new: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in (new or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _set_dotted(cfg: dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _get_dotted(cfg: dict, dotted: str) -> Any:
    node = cfg
    for k in dotted.split("."):
        if isinstance(node, list):
            node = node[int(k)]
        else:
            node = node[k]
    return node


def resolve_interpolations(cfg: dict) -> dict:
    """Resolve ``${a.b.c}`` references against the root config.

    Only whole-value references are supported (that is all the reference
    config corpus uses). Chained references resolve recursively; cycles raise.
    """
    root = copy.deepcopy(cfg)

    def resolve_value(v: Any, seen: tuple) -> Any:
        if isinstance(v, str):
            m = _INTERP_RE.match(v)
            if m:
                ref = m.group(1)
                if ref in seen:
                    raise ValueError(f"Interpolation cycle at ${{{ref}}}")
                try:
                    tgt = _get_dotted(root, ref)
                except (KeyError, IndexError, TypeError):
                    raise KeyError(f"Cannot resolve interpolation ${{{ref}}}")
                return resolve_value(copy.deepcopy(tgt), seen + (ref,))
            return v
        if isinstance(v, dict):
            return {k: resolve_value(x, seen) for k, x in v.items()}
        if isinstance(v, list):
            return [resolve_value(x, seen) for x in v]
        return v

    return resolve_value(root, ())
