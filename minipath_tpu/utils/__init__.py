"""Shared utilities: streaming stats, image conversion, profiling, bit ops."""

from minipath_tpu.utils.stats import Stats
from minipath_tpu.utils.image import color_to_image, save_png
from minipath_tpu.utils.profiling import PhaseTimers


def bit_iter(mask: int):
    """Iterate indices of set bits, lowest first.

    Host-side parity with the reference's movemask scanning helper
    (``/root/reference/src/util/mod.rs:6-31``); device code uses dense masks
    instead, but build/debug tooling still wants this.
    """
    mask = int(mask)
    assert mask >= 0
    while mask:
        low = mask & -mask
        yield low.bit_length() - 1
        mask ^= low


__all__ = ["PhaseTimers", "Stats", "bit_iter", "color_to_image", "save_png"]


# Rec. 709 luminance weights — the single definition every module (pilot
# allocation, variance buffers, GUI display) shares.
import numpy as _np

LUMA_WEIGHTS = _np.array([0.2126, 0.7152, 0.0722], _np.float32)
