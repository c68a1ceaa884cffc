"""Shared utilities: streaming stats, image conversion, timers."""

from minipath_tpu.utils.stats import Stats
from minipath_tpu.utils.image import color_to_image, save_png

__all__ = ["Stats", "color_to_image", "save_png"]
