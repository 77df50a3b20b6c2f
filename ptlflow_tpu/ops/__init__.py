from .grid_sample import grid_sample, bilinear_sampler, interpolate
from .correlation import (
    coords_grid, all_pairs_correlation, build_corr_pyramid,
    corr_pyramid_lookup, CorrBlock, local_correlation,
)
from .upsample import convex_upsample, upflow
from .resize import InputPadder, InputScaler
from .warp import backward_warp, forward_interpolate, fb_check
