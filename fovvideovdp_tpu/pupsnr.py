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
        def frame_psnr(T, R):
            mse = jnp.mean((pu.encode(T) - pu.encode(R)) ** 2)
            return 20.0 * jnp.log10(pu.peak / jnp.sqrt(mse))

        self._frame_psnr = frame_psnr

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
        psnr = 0.0
        for ff in range(N_frames):
            T = vid_source.get_test_frame(ff)
            R = vid_source.get_reference_frame(ff)
            psnr = psnr + float(self._frame_psnr(T, R)) / N_frames
        return psnr, None

    def short_name(self):
        return "PU21-PSNR"

    def quality_unit(self):
        return "dB"

    def get_info_string(self):
        return None
