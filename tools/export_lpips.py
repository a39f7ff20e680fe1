"""Export LPIPS-VGG weights to the .npz consumed by
`d3ga_tpu/train/lpips.py::init_lpips`.

Run on ANY machine with internet access + `pip install lpips torch`:

    python tools/export_lpips.py lpips_vgg.npz

then set `train.lpips_weights_path: lpips_vgg.npz` in the config. The
export contains torchvision VGG16 conv weights (w0..w12 / b0..b12, in
features order) and the five learned LPIPS linear calibration vectors
(lin0..lin4) from `lpips.LPIPS(net="vgg")`.
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips  # type: ignore

    model = lpips.LPIPS(net="vgg")
    arrays = {}
    # vgg16 conv stack lives at model.net.slice1..slice5 (torchvision
    # features modules re-wrapped); walk them in order.
    idx = 0
    for s in (model.net.slice1, model.net.slice2, model.net.slice3,
              model.net.slice4, model.net.slice5):
        for layer in s:
            if layer.__class__.__name__ == "Conv2d":
                arrays[f"w{idx}"] = layer.weight.detach().numpy()
                arrays[f"b{idx}"] = layer.bias.detach().numpy()
                idx += 1
    assert idx == 13, f"expected 13 VGG16 convs, got {idx}"
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        arrays[f"lin{i}"] = w.reshape(-1)
    np.savez(out_path, **arrays)
    print(f"wrote {out_path}: {sorted(arrays)[:4]}... ({len(arrays)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
