from .png import write_png, read_png
from .metrics import psnr, FpsCounter, FrameTimer

__all__ = ["write_png", "read_png", "psnr", "FpsCounter", "FrameTimer"]
