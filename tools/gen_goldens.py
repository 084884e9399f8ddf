"""Generate golden test fixtures by RUNNING the reference implementation
(PyTorch, CPU) on small deterministic inputs.

This is the rebuild's primary correctness leg: the reference has no CI suite
and validates itself against MATLAB intermediate dumps (pyfvvdp/fvvdp_test.py);
we promote that idea into generated .npz fixtures that our JAX implementation
is tested against (SURVEY.md section 4).

The reference package imports `ffmpeg` / `imageio` at module scope; those are
stubbed out since no media decoding is exercised here.

Usage: python tools/gen_goldens.py [outdir]
"""
import os
import sys
import types

import numpy as np

REFERENCE = "/root/reference"
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")

# --- stub out decoding deps the reference imports at module scope ----------
for name in ["ffmpeg"]:
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
try:
    import imageio.v2  # noqa: F401
except Exception:
    imageio = types.ModuleType("imageio")
    imageio.v2 = types.ModuleType("imageio.v2")
    sys.modules["imageio"] = imageio
    sys.modules["imageio.v2"] = imageio.v2

sys.path.insert(0, REFERENCE)

import torch  # noqa: E402
import pyfvvdp  # noqa: E402
from pyfvvdp.fvvdp import fvvdp  # noqa: E402
from pyfvvdp.fvvdp_lpyr_dec import fvvdp_lpyr_dec, fvvdp_contrast_pyr  # noqa: E402
from pyfvvdp.fvvdp_display_model import (  # noqa: E402
    fvvdp_display_photometry, fvvdp_display_geometry, fvvdp_display_photo_absolute)
from pyfvvdp import utils as ref_utils  # noqa: E402
from pyfvvdp.interp import interp3  # noqa: E402
from pyfvvdp.visualize_diff_map import visualize_diff_map  # noqa: E402

torch.set_num_threads(1)
os.makedirs(OUT, exist_ok=True)
DEV = torch.device("cpu")


def save(name, **arrs):
    path = os.path.join(OUT, name + ".npz")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrs.items()})
    print("wrote", path, "|", ", ".join(f"{k}{np.asarray(v).shape}" for k, v in arrs.items()))


def t2n(x):
    return x.detach().cpu().numpy()


rng = np.random.RandomState(1234)

# ---------------------------------------------------------------------------
# 1. Display models
# ---------------------------------------------------------------------------
V = np.linspace(0, 1, 64).astype(np.float32)
photo = {}
for disp in ["standard_4k", "standard_fhd", "standard_hdr_pq", "standard_hdr_linear",
             "htc_vive_pro", "standard_hmd"]:
    pm = fvvdp_display_photometry.load(disp)
    photo[f"{disp}_L"] = t2n(pm.forward(torch.tensor(V)))
    photo[f"{disp}_black"] = pm.get_black_level()
    gm = fvvdp_display_geometry.load(disp)
    photo[f"{disp}_ppd"] = gm.get_ppd()
save("display_models", V=V, **photo)

# geometry maps for foveation (small grid on htc_vive_pro)
gm = fvvdp_display_geometry.load("htc_vive_pro")
w_band, h_band = 24, 20
xv = torch.linspace(0.5, w_band - 0.5, w_band)
yv = torch.linspace(0.5, h_band - 0.5, h_band)
xx, yy = torch.meshgrid(xv, yv, indexing="xy")
view_dir = gm.pix2view_direction(torch.tensor((w_band, h_band)), xx, yy)
res_mag = gm.get_resolution_magnification(view_dir)
ppd_map = gm.get_ppd(view_dir)
save("geometry_maps", view_dir=t2n(view_dir), res_mag=t2n(res_mag), ppd_map=t2n(ppd_map),
     w_band=w_band, h_band=h_band)

# ---------------------------------------------------------------------------
# 2. Pyramid (plain + contrast) on a random image batch
# ---------------------------------------------------------------------------
for tag, (H, W) in [("even", (64, 96)), ("odd", (67, 94)), ("oddw", (62, 95))]:
    img = rng.rand(4, 1, H, W).astype(np.float32) * 100 + 0.05
    ppd = 31.0
    lp = fvvdp_lpyr_dec(W, H, ppd, DEV)
    bands, gbands = lp.decompose(torch.tensor(img))
    out = {"img": img, "ppd": ppd, "height": lp.height, "band_freqs": lp.band_freqs}
    for i, b in enumerate(bands):
        out[f"lband_{i}"] = t2n(b)
    for i, g in enumerate(gbands):
        out[f"gband_{i}"] = t2n(g)
    # reconstruct
    out["recon"] = t2n(lp.reconstruct(bands))
    # contrast pyramid
    cp = fvvdp_contrast_pyr(W, H, ppd, DEV)
    cbands, Lbkg = cp.decompose(torch.tensor(img))
    for i, b in enumerate(cbands):
        out[f"cband_{i}"] = t2n(b)
    for i, b in enumerate(Lbkg):
        out[f"lbkg_{i}"] = t2n(b)
    save(f"pyramid_{tag}", **out)

# ---------------------------------------------------------------------------
# 3. Temporal filters
# ---------------------------------------------------------------------------
fv = fvvdp(display_name="standard_4k", heatmap=None, device=DEV)
tf = {}
for fps in [24, 30, 50, 60, 90, 120]:
    fv.filter_len = int(np.ceil(250.0 / (1000.0 / fps)))
    F, omega = fv.get_temporal_filters(fps)
    tf[f"F_{fps}"] = t2n(F)
    tf[f"fl_{fps}"] = fv.filter_len
save("temporal_filters", **tf)

# ---------------------------------------------------------------------------
# 4. CSF sensitivity via the shipped LUT
# ---------------------------------------------------------------------------
n = 4096
rho_q = 2.0 ** rng.uniform(-5, 7, n).astype(np.float32)
L_q = 10.0 ** rng.uniform(-4, 5, n).astype(np.float32)
ecc_q = rng.uniform(0, 130, n).astype(np.float32) ** 1.0
csf = {}
for oo in [0, 5]:
    S = fv.cached_sensitivity(torch.tensor(rho_q), torch.tensor(float(oo)),
                              torch.tensor(L_q), torch.tensor(ecc_q), fv.csf_sigma)
    csf[f"S_omega{oo}"] = t2n(S)
save("csf_lut", rho=rho_q, L=L_q, ecc=ecc_q, **csf)

# ---------------------------------------------------------------------------
# 5. End-to-end image path (standard_4k, small random images)
# ---------------------------------------------------------------------------
H, W = 72, 108
I_ref8 = (rng.rand(H, W, 3) * 255).astype(np.uint8)
noise = rng.randn(H, W, 3) * 0.04
I_tst8 = np.clip(I_ref8 / 255.0 + noise, 0, 1)
I_tst8 = (I_tst8 * 255).astype(np.uint8)

fv_img = fvvdp(display_name="standard_4k", heatmap="raw", device=DEV)
Q, stats = fv_img.predict(I_tst8, I_ref8, dim_order="HWC")
save("image_path_uint8", test=I_tst8, ref=I_ref8, Q_jod=float(Q),
     Q_per_ch=stats["Q_per_ch"], rho_band=stats["rho_band"],
     heatmap=stats["heatmap"].to(torch.float32).numpy())

# threshold heatmap variant (exercises visualize_diff_map)
fv_img_t = fvvdp(display_name="standard_4k", heatmap="threshold", device=DEV)
Qt, stats_t = fv_img_t.predict(I_tst8, I_ref8, dim_order="HWC")
save("image_path_heatmap_threshold", Q_jod=float(Qt),
     heatmap=stats_t["heatmap"].to(torch.float32).numpy())

# uint16 input
I_ref16 = (rng.rand(H, W, 3) * 65535).astype(np.uint16)
I_tst16 = np.clip(I_ref16 / 65535.0 + rng.randn(H, W, 3) * 0.02, 0, 1)
I_tst16 = (I_tst16 * 65535).astype(np.uint16)
Q16, stats16 = fv_img.predict(I_tst16, I_ref16, dim_order="HWC")
save("image_path_uint16", test=I_tst16, ref=I_ref16, Q_jod=float(Q16),
     Q_per_ch=stats16["Q_per_ch"])

# grayscale float input
I_reff = rng.rand(H, W).astype(np.float32)
I_tstf = np.clip(I_reff + rng.randn(H, W).astype(np.float32) * 0.03, 0, 1).astype(np.float32)
Qf, statsf = fv_img.predict(I_tstf, I_reff, dim_order="HW")
save("image_path_gray_float", test=I_tstf, ref=I_reff, Q_jod=float(Qf),
     Q_per_ch=statsf["Q_per_ch"])

# HDR absolute-luminance path
fv_hdr = fvvdp(display_photometry=fvvdp_display_photo_absolute(L_max=4000),
               display_geometry=fvvdp_display_geometry.load("standard_hdr_linear"),
               heatmap=None, device=DEV)
L_ref = (10.0 ** rng.uniform(-1, 3.2, (H, W))).astype(np.float32)
L_tst = (L_ref * (1 + rng.randn(H, W) * 0.1)).clip(0.0001, 6000).astype(np.float32)
Qh, statsh = fv_hdr.predict(L_tst, L_ref, dim_order="HW")
save("image_path_hdr_abs", test=L_tst, ref=L_ref, Q_jod=float(Qh),
     Q_per_ch=statsh["Q_per_ch"])

# ---------------------------------------------------------------------------
# 6. End-to-end video path
# ---------------------------------------------------------------------------
H, W, F = 48, 64, 12
fps = 30
V_ref = (rng.rand(H, W, 3, F) * 255).astype(np.uint8)
V_tst = np.clip(V_ref / 255.0 + rng.randn(H, W, 3, F) * 0.05, 0, 1)
V_tst = (V_tst * 255).astype(np.uint8)

for padding in ["replicate", "circular", "pingpong"]:
    fv_vid = fvvdp(display_name="standard_fhd", heatmap=None, device=DEV,
                   temp_padding=padding)
    Qv, statsv = fv_vid.predict(V_tst, V_ref, dim_order="HWCF", frames_per_second=fps)
    save(f"video_path_{padding}", test=V_tst, ref=V_ref, fps=fps, Q_jod=float(Qv),
         Q_per_ch=statsv["Q_per_ch"])

# video with raw heatmap
fv_vid_h = fvvdp(display_name="standard_fhd", heatmap="raw", device=DEV)
Qvh, statsvh = fv_vid_h.predict(V_tst, V_ref, dim_order="HWCF", frames_per_second=fps)
save("video_path_heatmap", Q_jod=float(Qvh),
     heatmap=statsvh["heatmap"].to(torch.float32).numpy())

# ---------------------------------------------------------------------------
# 7. Foveated video (moving gaze) on htc_vive_pro
# ---------------------------------------------------------------------------
H, W, F = 40, 36, 6
V_ref = (rng.rand(H, W, 3, F) * 255).astype(np.uint8)
V_tst = np.clip(V_ref / 255.0 + rng.randn(H, W, 3, F) * 0.05, 0, 1)
V_tst = (V_tst * 255).astype(np.uint8)
gaze = np.stack((np.linspace(0, W - 1, F), np.linspace(0, H - 1, F))).T

fv_fov = fvvdp(display_name="htc_vive_pro", heatmap=None, foveated=True, device=DEV)
Qg, statsg = fv_fov.predict(V_tst, V_ref, dim_order="HWCF", frames_per_second=30,
                            fixation_point=gaze)
save("foveated_video", test=V_tst, ref=V_ref, gaze=gaze, Q_jod=float(Qg),
     Q_per_ch=statsg["Q_per_ch"])

# foveated image, fixed gaze
I_ref8 = V_ref[..., 0]
I_tst8 = V_tst[..., 0]
Qgi, statsgi = fv_fov.predict(I_tst8, I_ref8, dim_order="HWC",
                              fixation_point=np.array([5, 7]))
save("foveated_image", test=I_tst8, ref=I_ref8, Q_jod=float(Qgi),
     Q_per_ch=statsgi["Q_per_ch"])

# ---------------------------------------------------------------------------
# 8. PU transform + PU-PSNR
# ---------------------------------------------------------------------------
Y = (10.0 ** rng.uniform(-3, 4, 256)).astype(np.float32)
pu = ref_utils.PU()
save("pu_transform", Y=Y, V=t2n(pu.encode(torch.tensor(Y))), peak=pu.peak)

from pyfvvdp.pupsnr import pu_psnr  # noqa: E402
pp = pu_psnr(device=DEV)
pp.display_photometry = fvvdp_display_photometry.load("standard_4k")
pp.color_space = "sRGB"
H, W = 48, 64
A = (rng.rand(H, W, 3) * 255).astype(np.uint8)
B = np.clip(A / 255.0 + rng.randn(H, W, 3) * 0.03, 0, 1)
B = (B * 255).astype(np.uint8)
Qp, _ = pp.predict(B, A, dim_order="HWC")
save("pu_psnr", test=B, ref=A, Q=float(Qp))

# ---------------------------------------------------------------------------
# 8b. Decode-matched ferris goldens: decode the mp4 ONCE with OpenCV and
# score the decoded arrays through the reference, so the file-pipeline test
# can assert <= 0.01 JOD with the decoder held fixed (the published README
# numbers embed the reference's piped-ffmpeg decode, a different chroma
# upsample — only comparable at the 0.05 cross-decoder tolerance).
# Reference path exercised: pyfvvdp/fvvdp.py:181-357 on the same frames the
# TPU build's cv2 fallback feeds (video_source_file.py:166-276 equivalence).
# ---------------------------------------------------------------------------
try:
    import cv2
except ImportError:
    cv2 = None
ALIASING = os.path.join(REFERENCE, "example_media", "aliasing")
if cv2 is not None and os.path.isfile(os.path.join(ALIASING, "ferris-ref.mp4")):
    def _grab(path, n):
        cap = cv2.VideoCapture(path)
        frames = []
        for _ in range(n):
            ok, bgr = cap.read()
            assert ok, (path, len(frames))
            frames.append(bgr[:, :, ::-1].copy())
        cap.release()
        return np.stack(frames)  # (n, H, W, 3) uint8 RGB

    fv_fer = fvvdp(display_name="standard_fhd", heatmap=None, device=DEV)
    for n_frames, tag in [(12, "short"), (60, "full")]:
        tst = _grab(os.path.join(ALIASING, "ferris-bicubic-bicubic.mp4"),
                    n_frames)
        ref = _grab(os.path.join(ALIASING, "ferris-ref.mp4"), n_frames)
        Qf, stf = fv_fer.predict(tst, ref, dim_order="FHWC",
                                 frames_per_second=25)
        save(f"ferris_cv2_{tag}", Q_jod=float(Qf), n_frames=n_frames,
             Q_per_ch=stf["Q_per_ch"])
else:
    print("cv2 or ferris media unavailable; skipping decode-matched goldens")

# ---------------------------------------------------------------------------
# 9. interp3 reference grid
# ---------------------------------------------------------------------------
x = np.array([1.0, 2.0, 3.0], np.float32)
v = rng.rand(3, 3, 3).astype(np.float32)
xq = rng.uniform(0.5, 3.5, 50).astype(np.float32)
yq = rng.uniform(0.5, 3.5, 50).astype(np.float32)
zq = rng.uniform(0.5, 3.5, 50).astype(np.float32)
out = interp3(torch.tensor(x), torch.tensor(x), torch.tensor(x), torch.tensor(v),
              torch.tensor(xq), torch.tensor(yq), torch.tensor(zq))
save("interp3", x=x, v=v, xq=xq, yq=yq, zq=zq, out=t2n(out))

print("All goldens written to", OUT)
