"""Dense occupancy grid (values + occupancy + region-of-interest masks).

TPU-native equivalent of the reference CUDA ``OccupancyGrid``
(src/OccupancyGrid.cu, kernels/volsurfs/OccupancyGridGPU.cuh). The reference
stores grids as Morton-ordered flat tensors because its DDA kernels benefit
from locality; on TPU we keep plain row-major ``[res, res, res]`` arrays —
lookups are dense gathers and Morton order buys nothing.

The grid is a pytree so it can live inside jitted train steps and be donated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


def logistic_pdf(x, beta):
    """Logistic-distribution density used by NeuS
    (reference volsurfs_py/utils/logistic_distribution.py:11-24 and
    kernels/volsurfs/OccupancyGridGPU.cuh:228-233)."""
    exp_term = jnp.clip(jnp.exp(-beta * x), -1e6, 1e6)
    return beta * exp_term / (1.0 + exp_term) ** 2


@struct.dataclass
class OccupancyGrid:
    """res^3 occupancy / value / ROI grids centered on the origin.

    Attributes:
      values:    [res, res, res] float32 (density or |sdf| per voxel).
      occupancy: [res, res, res] bool.
      roi:       [res, res, res] bool region-of-interest mask.
      extent:    [3] float32 world-space side lengths of the grid.
    """

    values: jnp.ndarray
    occupancy: jnp.ndarray
    roi: jnp.ndarray
    extent: jnp.ndarray

    @property
    def res(self) -> int:
        return self.values.shape[0]

    # ---- geometry helpers -------------------------------------------------

    def voxel_size(self) -> jnp.ndarray:
        return self.extent / self.res

    def voxel_centers(self) -> jnp.ndarray:
        """[res^3, 3] world-space voxel centers (row-major x, y, z order)."""
        res = self.res
        idx = jnp.arange(res, dtype=jnp.float32)
        grid = jnp.stack(
            jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1
        ).reshape(-1, 3)
        return ((grid + 0.5) / res - 0.5) * self.extent

    def pos_to_voxel_idx(self, points):
        """[N, 3] world positions -> ([N, 3] int32 voxel coords, [N] in-bounds).

        Mirrors pos_to_lin_idx (reference kernels/volsurfs/occ_grid_helpers.h:53-78)
        minus the Morton encoding.
        """
        normalized = points / self.extent + 0.5
        coords = jnp.floor(normalized * self.res).astype(jnp.int32)
        in_bounds = jnp.all((coords >= 0) & (coords < self.res), axis=-1)
        coords = jnp.clip(coords, 0, self.res - 1)
        return coords, in_bounds

    def check_occupancy(self, points):
        """[N, 3] -> [N] bool: point lies in an occupied & in-ROI voxel
        (reference kernels/volsurfs/OccupancyGridGPU.cuh:397-443)."""
        coords, in_bounds = self.pos_to_voxel_idx(points)
        occ = self.occupancy[coords[:, 0], coords[:, 1], coords[:, 2]]
        roi = self.roi[coords[:, 0], coords[:, 1], coords[:, 2]]
        return occ & roi & in_bounds

    def occupancy_fraction(self):
        """Fraction of in-ROI voxels currently occupied (observability metric,
        reference src/OccupancyGrid.cu get_nr_occupied_voxels)."""
        roi_count = jnp.maximum(jnp.sum(self.roi), 1)
        return jnp.sum(self.occupancy & self.roi) / roi_count

    # ---- sampling points for re-evaluation --------------------------------

    def get_grid_samples(self, key: jax.Array | None = None):
        """Voxel-center points (optionally jittered inside each voxel) at which
        the caller re-evaluates its field
        (reference src/OccupancyGrid.cu:236-320 get_grid_samples).

        Returns [res^3, 3] points; the implicit index of point i is the
        row-major voxel index i.
        """
        centers = self.voxel_centers()
        if key is not None:
            jitter = jax.random.uniform(
                key, centers.shape, minval=-0.5, maxval=0.5
            ) * self.voxel_size()
            centers = centers + jitter
        return centers

    # ---- updates -----------------------------------------------------------

    def update_values(self, new_values, decay: float = 0.0) -> "OccupancyGrid":
        """values <- max(new, old * decay)
        (reference kernels/volsurfs/OccupancyGridGPU.cuh:123-152).

        Args:
          new_values: [res^3] or [res^3, 1] evaluated at get_grid_samples points.
        """
        new_values = new_values.reshape(self.values.shape)
        updated = jnp.maximum(new_values, self.values * decay)
        return self.replace(values=updated)

    def update_occupancy_with_density(
        self, occupancy_thresh: float = 1e-4
    ) -> "OccupancyGrid":
        """occupied iff stored density value > threshold
        (reference kernels/volsurfs/OccupancyGridGPU.cuh:153-226, without the
        optional 27-neighbour check which the reference disables)."""
        return self.replace(occupancy=self.values > occupancy_thresh)

    def update_occupancy_with_sdf(
        self, logistic_beta, occupancy_thresh: float = 1e-4
    ) -> "OccupancyGrid":
        """occupied iff the logistic density of the closest-possible SDF value
        inside the voxel exceeds the threshold
        (reference kernels/volsurfs/OccupancyGridGPU.cuh:272-317): the stored
        value is |sdf| at the voxel center; subtract half the voxel diagonal
        to bound the minimum distance achievable anywhere inside the voxel.
        """
        half_diag = 0.5 * jnp.linalg.norm(self.voxel_size())
        min_dist = jnp.clip(jnp.abs(self.values) - half_diag, 0.0, 1e10)
        weight = logistic_pdf(min_dist, logistic_beta)
        return self.replace(occupancy=weight > occupancy_thresh)

    def lookup_fn(self):
        """Returns a [N,3] -> [N] bool callable for the samplers."""
        return self.check_occupancy


def make_grid(res: int, extent, sphere_roi_radius: float | None = None) -> OccupancyGrid:
    """Create an all-occupied grid; optionally restrict the ROI to a sphere
    (reference src/OccupancyGrid.cu:117-182 init_sphere_roi /
    volsurfs_py/utils/occupancy_grid.py:6-13: res 256, extent = 2*scene_radius,
    ROI sphere of the scene radius)."""
    extent = jnp.broadcast_to(jnp.asarray(extent, jnp.float32), (3,))
    shape = (res, res, res)
    values = jnp.zeros(shape, dtype=jnp.float32)
    occupancy = jnp.ones(shape, dtype=bool)
    if sphere_roi_radius is not None:
        idx = jnp.arange(res, dtype=jnp.float32)
        grid = jnp.stack(jnp.meshgrid(idx, idx, idx, indexing="ij"), axis=-1)
        centers = ((grid + 0.5) / res - 0.5) * extent
        roi = jnp.linalg.norm(centers, axis=-1) <= sphere_roi_radius
    else:
        roi = jnp.ones(shape, dtype=bool)
    return OccupancyGrid(values=values, occupancy=occupancy, roi=roi, extent=extent)
