"""PU21-PSNR metric — second metric behind the same interface
(parity: pyfvvdp/pupsnr.py:9-88), computed in one fused jit over all frames.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fovvideovdp_tpu.utils import PU
from fovvideovdp_tpu.video_source import fvvdp_video_source_array


class pu_psnr:
    def __init__(self, device=None):
        self.device = device
        self.pu = PU()
        self.display_photometry = "sdr_4k_30"
        self.color_space = "sRGB"

        pu = self.pu

        @jax.jit
        def block_psnr(T, R):
            # (n, H, W) luminance blocks -> (n,) per-frame PU21-PSNR
            mse = jnp.mean((pu.encode(T) - pu.encode(R)) ** 2, axis=(-2, -1))
            return 20.0 * jnp.log10(pu.peak / jnp.sqrt(mse))

        self._block_psnr = block_psnr

    def predict(self, test_cont, reference_cont, dim_order="BCFHW",
                frames_per_second=0, fixation_point=None,
                frame_padding="replicate"):
        vs = fvvdp_video_source_array(
            test_cont, reference_cont, frames_per_second, dim_order=dim_order,
            display_photometry=self.display_photometry,
            color_space_name=self.color_space)
        return self.predict_video_source(vs, fixation_point=fixation_point,
                                         frame_padding=frame_padding)

    def predict_video_source(self, vid_source, fixation_point=None,
                             frame_padding="replicate"):
        _, _, N_frames = vid_source.get_video_size()
        # Blocked access path: frames stream through one jitted program per
        # block with a single host sync per block (not per frame); short tail
        # blocks are padded to the compiled block shape and sliced after.
        B = min(16, N_frames)
        frame_psnrs = np.zeros((N_frames,), dtype=np.float64)
        pos = 0
        while pos < N_frames:
            b = min(B, N_frames - pos)
            T, R = vid_source.get_luminance_block(pos, b)
            if b < B:
                T = jnp.concatenate([T, jnp.repeat(T[-1:], B - b, axis=0)])
                R = jnp.concatenate([R, jnp.repeat(R[-1:], B - b, axis=0)])
            frame_psnrs[pos:pos + b] = np.asarray(self._block_psnr(T, R))[:b]
            pos += b
        return float(frame_psnrs.mean()), None

    def short_name(self):
        return "PU21-PSNR"

    def quality_unit(self):
        return "dB"

    def get_info_string(self):
        return None
