"""Convert the published FovVideoVDP CSF cache (.mat LUTs) into .npz files
shipped with fovvideovdp_tpu.

The LUT contents are calibration data of the published metric
(reference: pyfvvdp/csf_cache/o{0,5}_sn1_5_cm0_604562_gpu0.mat, loaded in
pyfvvdp/fvvdp.py:505-518).  Axes: Y (32, log-spaced 1e-3..1e4),
rho (32, log-spaced 2^-4..64 cpd), ecc (32, sqrt-spaced 0..120 deg);
S_log is log2 sensitivity indexed [Y, rho, ecc].

Usage: python tools/convert_csf_cache.py <src_cache_dir> <dst_data_dir>
"""
import os
import sys

import numpy as np
import scipy.io as sio


def convert(src: str, dst: str) -> None:
    m = sio.loadmat(src)
    lut = m["lut"]
    out = {}
    for name in lut.dtype.names:
        v = np.ascontiguousarray(lut[name][0, 0]).astype(np.float32)
        if name != "S_log":
            v = v.ravel()
        out[name] = v
    np.savez_compressed(dst, **out)
    print(f"{src} -> {dst}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    src_dir, dst_dir = sys.argv[1], sys.argv[2]
    for fname in sorted(os.listdir(src_dir)):
        if fname.endswith(".mat"):
            key = fname[:-len("_gpu0.mat")] if fname.endswith("_gpu0.mat") else fname[:-4]
            convert(os.path.join(src_dir, fname), os.path.join(dst_dir, f"csf_lut_{key}.npz"))
