from .renderer import render_rays, render_image
from .density_grid import (
    DensityGridSpec, density_grid_init, grid_active_mask,
    make_grid_updater, should_update, staged_interval,
)
from .rays import camera_directions, rays_from_pose, orbit_poses
