"""Convert torchvision VGG16 + LPIPS head weights to our flax LPIPS layout.

Usage (on a machine with torchvision + the downloaded vgg.pth):

  python tools/convert_lpips.py --vgg_pth checkpoints/lpips/vgg.pth \
      --out checkpoints/lpips/vgg_lpips.npz

The reference auto-downloads vgg.pth (reference vidtok/modules/lpips.py:13-58,
md5 d507d7349b931f0638a25a48a722f98a) and uses torchvision's pretrained VGG16
features. This environment has no torchvision and no egress, so conversion
runs wherever those weights exist; the output .npz drops into
checkpoints/lpips/ here.

Mapping: torchvision vgg16.features conv indices [0,2,5,7,10,12,14,17,19,21,
24,26,28] -> vgg/conv{0..12}; lin{0..4}.model.1.weight ([1,C,1,1]) ->
lin{k}/kernel ([1,1,C,1]).
"""

import argparse

import numpy as np

# torchvision vgg16.features Sequential indices of the 13 convs
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert(vgg_features_sd, lpips_sd):
    """vgg_features_sd: {'0.weight': ...} torchvision features state dict;
    lpips_sd: vgg.pth state dict with lin{k}.model.1.weight."""
    flat = {}
    for j, idx in enumerate(VGG16_CONV_IDX):
        w = np.asarray(vgg_features_sd[f"{idx}.weight"])  # [O,I,kh,kw]
        b = np.asarray(vgg_features_sd[f"{idx}.bias"])
        flat[f"vgg/conv{j}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        flat[f"vgg/conv{j}/bias"] = b
    for k in range(5):
        w = np.asarray(lpips_sd[f"lin{k}.model.1.weight"])  # [1,C,1,1]
        flat[f"lin{k}/kernel"] = np.transpose(w, (2, 3, 1, 0))
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg_pth", required=True)
    ap.add_argument("--out", default="checkpoints/lpips/vgg_lpips.npz")
    args = ap.parse_args()

    import os

    import torch
    from torchvision import models

    vgg = models.vgg16(pretrained=True).features.state_dict()
    lp = torch.load(args.vgg_pth, map_location="cpu")
    lp = {k: v.numpy() for k, v in lp.items()}
    vgg = {k: v.numpy() for k, v in vgg.items()}
    flat = convert(vgg, lp)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **flat)
    print(f"wrote {args.out} ({len(flat)} arrays)")


if __name__ == "__main__":
    main()
