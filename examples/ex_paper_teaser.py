"""Reproduce the paper's teaser figure: a reference image, two distortions
(noise and blur) matched in PU21-PSNR but differing strongly in JOD, with
their difference heatmaps side by side (mirrors
matlab/examples/ex_paper_teaser.m).

Writes ``teaser.png`` next to this script.
"""
import os
import sys

import numpy as np

from ex_utils import imgaussblur, imnoise
from fovvideovdp_tpu import fvvdp, load_image_as_array
from fovvideovdp_tpu.pupsnr import pu_psnr

MEDIA = os.environ.get(
    "FVVDP_MEDIA", os.path.join("/root", "reference", "example_media"))


def main():
    img_path = os.path.join(MEDIA, "wavy_facade.png")
    if not os.path.isfile(img_path):
        print(f"example media not found: {img_path}", file=sys.stderr)
        return 1
    I_ref = load_image_as_array(img_path)

    np.random.seed(42)
    distortions = {
        "noise": imnoise(I_ref, np.sqrt(0.003)),
        "blur": imgaussblur(I_ref, 2),
    }

    fv = fvvdp(display_name="standard_4k", heatmap="threshold")
    pp = pu_psnr()
    panels = [I_ref]
    for name, I_test in distortions.items():
        Q_jod, stats = fv.predict(I_test, I_ref, dim_order="HWC")
        Q_psnr, _ = pp.predict(I_test, I_ref, dim_order="HWC")
        print(f"{name}: {Q_jod:.3f} JOD | {Q_psnr:.2f} dB PU21-PSNR")
        heat = np.asarray(stats["heatmap"][0, :, 0].transpose(1, 2, 0),
                          dtype=np.float32)
        panels += [I_test, (np.clip(heat, 0, 1) * 65535).astype(I_ref.dtype)]

    teaser = np.concatenate(panels, axis=1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "teaser.png")
    try:
        import cv2
        cv2.imwrite(out, cv2.cvtColor(teaser, cv2.COLOR_RGB2BGR))
        print(f"wrote {out}")
    except Exception as e:  # pragma: no cover - cosmetic output only
        print(f"could not write {out}: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
