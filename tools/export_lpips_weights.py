"""Export LPIPS(VGG16) weights to the .npz layout splatco_tpu.ops.lpips
expects.  Run on a machine WITH network access:

    python tools/export_lpips_weights.py lpips_vgg.npz

then point SPLATCO_LPIPS_WEIGHTS at the file (or pass --lpips_weights).
"""
import sys

import numpy as np


def main(out_path: str) -> None:
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    out = {}
    li = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{li}_w"] = layer.weight.detach().numpy()
            out[f"conv{li}_b"] = layer.bias.detach().numpy()
            li += 1
    # richzhang v0.1 lin weights
    url = ("https://raw.githubusercontent.com/richzhang/"
           "PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth")
    sd = torch.hub.load_state_dict_from_url(url, progress=True,
                                            map_location="cpu")
    for i in range(5):
        out[f"lin{i}"] = sd[f"lin{i}.model.1.weight"].numpy().reshape(-1)
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path} ({li} convs + 5 lin layers)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
