from zraytrace_tpu.io.png import read_png, write_png
from zraytrace_tpu.io.ppm import write_ppm
from zraytrace_tpu.io.obj import read_obj

__all__ = ["read_png", "write_png", "write_ppm", "read_obj"]
