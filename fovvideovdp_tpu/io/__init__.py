"""Host-side I/O: image loading, raw YUV readers, ffmpeg-piped video decode."""
