"""Convert torch `lpips` package weights to the .npz hugs_tpu loads.

Run on a machine that has torch + the lpips pip package (and its
downloaded pretrained weights):

    python scripts/convert_lpips.py -o lpips_vgg.npz

Then point the framework at it: `tpu.lpips_weights=lpips_vgg.npz`.
Field layout consumed by hugs_tpu/losses/lpips.py: conv_{i}_w (kh,kw,cin,
cout) HWIO, conv_{i}_b (cout,) for the 13 VGG16 convs, lin_{t} (c_tap,)
for the 5 LPIPS linear heads.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch  # noqa
    import lpips  # noqa

    model = lpips.LPIPS(net="vgg", pretrained=True)
    out = {}
    convs = [m for m in model.net.slice1 + model.net.slice2 +
             model.net.slice3 + model.net.slice4 + model.net.slice5
             if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13, len(convs)
    for i, c in enumerate(convs):
        # torch OIHW -> HWIO
        out[f"conv_{i}_w"] = c.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv_{i}_b"] = c.bias.detach().numpy()
    for t, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin_{t}"] = w.reshape(-1)
    np.savez(args.output, **out)
    print(f"wrote {args.output} with {len(out)} arrays")


if __name__ == "__main__":
    main()
