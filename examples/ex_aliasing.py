"""Score video files directly (file decode path): the ferris-wheel
aliasing clips (mirrors pytorch_examples/ex_aliasing.py).

Decodes through ffmpeg/ffprobe when the binaries are on PATH, otherwise
through OpenCV's bundled FFMPEG.  Needs the reference example media
(``example_media/aliasing/ferris-*.mp4``).  Expected JODs on standard_fhd
(reference README.md:108-111):

    ferris-bicubic-bicubic.mp4   6.469
    ferris-bicubic-nearest.mp4   6.328
    ferris-nearest-bicubic.mp4   5.923
    ferris-nearest-nearest.mp4   5.821
"""
import glob
import os
import shutil
import sys
import time

# runnable from a source checkout: add the repo root when not installed
import importlib.util as _ilu
import os as _os
import sys as _sys
if _ilu.find_spec("fovvideovdp_tpu") is None:
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
from fovvideovdp_tpu import fvvdp
from fovvideovdp_tpu.video_source_file import fvvdp_video_source_file

MEDIA = os.environ.get(
    "FVVDP_MEDIA", os.path.join("/root", "reference", "example_media"))


def main():
    if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
        try:
            import cv2  # noqa: F401
        except ImportError:
            print("Neither ffmpeg/ffprobe on PATH nor opencv-python "
                  "installed — cannot decode .mp4 files.", file=sys.stderr)
            return 1
    folder = os.path.join(MEDIA, "aliasing")
    ref_file = os.path.join(folder, "ferris-ref.mp4")
    tst_files = sorted(glob.glob(os.path.join(folder, "ferris-*-*.mp4")))
    if not os.path.isfile(ref_file) or not tst_files:
        print(f"example media not found under {folder}", file=sys.stderr)
        return 1

    fv = fvvdp(display_name="standard_fhd", heatmap=None)
    for tst_fname in tst_files:
        vs = fvvdp_video_source_file(tst_fname, ref_file,
                                     display_photometry="standard_fhd")
        t0 = time.time()
        Q_jod, _ = fv.predict_video_source(vs)
        print(f"Quality for {os.path.basename(tst_fname)}: {Q_jod:.3f} JOD "
              f"({time.time() - t0:.2f} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
