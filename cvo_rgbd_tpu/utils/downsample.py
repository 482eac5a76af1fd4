"""Host-side point-cloud preprocessing used by the MATLAB batch path.

Equivalents of pcRangeFilter (util/pcRangeFilter.m:1-14) and MATLAB's
`pcdownsample(..., 'gridAverage', gridStep)` as used by the batch
runner (rgbddataset_rkhs.m:40-47).  Runs on host numpy: it is a data
preparation step executed once per frame, not part of the jitted
registration loop.
"""

from __future__ import annotations

import numpy as np


def range_filter(positions, colors=None, rmin=0.8, rmax=4.0):
    """Keep points with rmin <= |p| <= rmax (pcRangeFilter.m:6-13)."""
    r = np.linalg.norm(positions, axis=1)
    keep = (r >= rmin) & (r <= rmax)
    if colors is None:
        return positions[keep]
    return positions[keep], colors[keep]


def grid_downsample(positions, colors=None, grid=0.05):
    """Grid-average downsample (MATLAB pcdownsample 'gridAverage').

    Points are binned into cubic voxels of size `grid`; each occupied
    voxel contributes the mean position (and mean color).

    Voxel edges start at the cloud's bounding-box min corner, matching
    MATLAB's pcdownsample, which grids the cloud's own bounding box
    rather than absolute space.  Calibrated against the stored MATLAB
    run (freiburg1_desk_07-May-2019-02-35-00.mat): with origin-anchored
    binning the vendored fixture pairs drifted ~5+ mm from the stored
    transforms; min-corner binning lands them sub-mm from the stored
    transforms at converged tolerances.  Remaining semantic variants
    (upper-boundary bin clamping, uint8 color rounding) were measured
    to move the aligned pose by <= 0.02 mm — this implementation is
    pose-equivalent to MATLAB's (docs/PARITY.md section 1,
    tests/test_matlab_parity.py).
    """
    positions = np.asarray(positions)
    keys = np.floor((positions - positions.min(axis=0)) / grid).astype(np.int64)
    # dictionary-order the voxels for a deterministic output ordering
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    keys_s = keys[order]
    pos_s = positions[order]
    boundary = np.any(np.diff(keys_s, axis=0) != 0, axis=1)
    starts = np.concatenate([[0], np.nonzero(boundary)[0] + 1])
    counts = np.diff(np.concatenate([starts, [len(pos_s)]]))
    sums = np.add.reduceat(pos_s, starts, axis=0)
    means = sums / counts[:, None]
    if colors is None:
        return means.astype(positions.dtype)
    col_s = np.asarray(colors)[order]
    csums = np.add.reduceat(col_s, starts, axis=0)
    cmeans = csums / counts[:, None]
    return means.astype(positions.dtype), cmeans.astype(col_s.dtype)
