"""Golden fixture loader: auto-generates fixtures from the torch reference
(subprocess, so the beartype/lightning stubs never pollute the test
process). Tests skip if neither fixtures nor the reference are available."""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(ROOT, "tests", "golden")
_GENERATED = {"done": False}


def load_golden(name: str):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        if _GENERATED["done"]:
            pytest.skip(f"golden {name} unavailable")
        _GENERATED["done"] = True
        if not os.path.isdir("/root/reference"):
            pytest.skip("reference repo not mounted; goldens unavailable")
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_goldens.py")],
            check=True, timeout=600,
        )
    if not os.path.exists(path):
        pytest.skip(f"golden {name} unavailable")
    data = np.load(path)
    sd = {}
    arrays = {}
    for k in data.files:
        if k.startswith("sd:"):
            sd[k[3:]] = data[k]
        else:
            arrays[k] = data[k]
    return sd, arrays
