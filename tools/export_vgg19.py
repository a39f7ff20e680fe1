"""Convert torchvision VGG19 weights to the npz layout consumed by
d3ga_tpu.train.losses.init_vgg19_features (w0,b0,w1,b1,... in
features-Sequential order, [out,in,k,k]).

Run on a machine with torchvision + the pretrained checkpoint (this
image has neither; the training falls back to a seeded random VGG):

    python tools/export_vgg19.py /path/to/vgg19_weights.npz
"""

import sys

import numpy as np


def main(out_path):
    import torchvision

    vgg = torchvision.models.vgg19(
        weights=torchvision.models.VGG19_Weights.DEFAULT
    ).features
    arrays = {}
    idx = 0
    for layer in vgg:
        if layer.__class__.__name__ == "Conv2d":
            arrays[f"w{idx}"] = layer.weight.detach().numpy()
            arrays[f"b{idx}"] = layer.bias.detach().numpy()
            idx += 1
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {idx} conv layers to {out_path}")


if __name__ == "__main__":
    main(sys.argv[1])
