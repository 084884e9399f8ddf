"""Fixed-point YUV -> float RGB conversion and chroma upsampling on device.

Mirrors the conversion math of the reference's GPU path
(pyfvvdp/video_source_file.py:253-276, video_source_yuv.py:205-228):
limited-range fixed-point scaling (16/219 luma, 128/224 chroma), bilinear
420 -> 444 chroma upscale with half-pixel centres, and the BT.709 / BT.2020
YCbCr -> RGB matrices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# NB: these are numerically the BT.601 full-range coefficients; the true
# BT.709 matrix would be [1, 0, 1.5748 / 1, -.1873, -.4681 / 1, 1.8556, 0].
# The reference uses exactly these values for its "BT.709" path
# (pyfvvdp/video_source_file.py:233-235, video_source_yuv.py:179-181), and
# the published golden JODs were produced through them — kept verbatim as
# the parity contract.
YCBCR2RGB_REC709 = np.array([[1.0, 0.0, 1.402],
                             [1.0, -0.344136, -0.714136],
                             [1.0, 1.772, 0.0]], dtype=np.float32)

YCBCR2RGB_REC2020 = np.array([[1.0, 0.0, 1.47460],
                              [1.0, -0.16455, -0.57135],
                              [1.0, 1.88140, 0.0]], dtype=np.float32)


def fixed2float_y(Y, bit_depth: int):
    offset = 16.0 / 219.0
    weight = 1.0 / (2 ** (bit_depth - 8) * 219.0)
    return jnp.clip(weight * Y.astype(jnp.float32) - offset, 0.0, 1.0)


def fixed2float_uv(uv, bit_depth: int):
    offset = 128.0 / 224.0
    weight = 1.0 / (2 ** (bit_depth - 8) * 224.0)
    return jnp.clip(weight * uv.astype(jnp.float32) - offset, -0.5, 0.5)


def upscale_chroma(uv, out_hw):
    """Bilinear 420 -> 444 upscale with half-pixel centres (matches
    torch.nn.functional.interpolate(scale_factor=2, mode='bilinear'))."""
    return jax.image.resize(uv, uv.shape[:-2] + tuple(out_hw), method="bilinear")


def yuv_to_rgb(Y, u, v, bit_depth: int, chroma_ss: str, bt2020: bool):
    """(H,W) luma + subsampled chroma planes -> (H, W, 3) display-encoded RGB."""
    H, W = Y.shape[-2:]
    Yf = fixed2float_y(Y, bit_depth)
    uvf = fixed2float_uv(jnp.stack((u, v)), bit_depth)
    if chroma_ss == "420":
        uvf = upscale_chroma(uvf, (H, W))
    Yuv = jnp.stack((Yf, uvf[0], uvf[1]), axis=-1)
    M = YCBCR2RGB_REC2020 if bt2020 else YCBCR2RGB_REC709
    # full-precision accumulation: the TPU's default single-pass bf16 matmul
    # would round the colour conversion by ~0.4% per channel, which the PQ
    # EOTF then amplifies on the HDR .yuv path
    return jnp.matmul(Yuv, jnp.asarray(M).T,
                      precision=jax.lax.Precision.HIGHEST)
