"""Host-side I/O: image loading, raw YUV readers, ffmpeg-piped video decode."""

# CLI --full-screen-resize choice -> jax.image.resize method.  One shared
# mapping (it was previously copy-pasted at three resize sites).  Note
# jax.image has no true area filter; 'area' degrades to linear like the
# reference's torch 'area'-via-interpolate path.
RESIZE_METHODS = {"nearest": "nearest", "bilinear": "bilinear",
                  "bicubic": "cubic", "area": "linear"}
