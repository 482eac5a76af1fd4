"""Toy example: register the vendored fr1/desk fixture clouds and stitch
the scene — the run_toy_example.m analog (run_toy_example.m:6-80).

MATLAB uses its Kinect `livingRoomData`; we use the five downsampled
fr1/desk clouds shipped with the reference dataset.  Pipeline per
frame: range filter -> grid downsample -> align -> chain accumTform ->
merge into one scene cloud -> write PLY.

Run:  python examples/toy_example.py [output.ply]
"""

import sys

import numpy as np

from cvo_rgbd_tpu import MATLAB_PARAMS, align_jit, pad_cloud
from cvo_rgbd_tpu.core.cloud import round_up
from cvo_rgbd_tpu.io.export import merge_clouds, transform_points, write_ply
from cvo_rgbd_tpu.io.pcd import read_pcd
from cvo_rgbd_tpu.utils import grid_downsample, range_filter

DS = "/root/reference/data/rgbd_dataset/freiburg1_desk/pcd_ds"
STAMPS = [
    "1305031453.359684",
    "1305031453.391690",
    "1305031453.423683",
    "1305031453.459685",
    "1305031453.491698",
]


def main(out_path="toy_scene.ply"):
    clouds = []
    for t in STAMPS:
        d = read_pcd(f"{DS}/{t}.pcd")
        pos, col = range_filter(d["positions"], d["colors"])
        pos, col = grid_downsample(pos, col, 0.05)  # run_toy_example.m:14-16
        clouds.append((pos, col * 255.0))

    cap = round_up(max(c[0].shape[0] for c in clouds))
    padded = [pad_cloud(p, c, capacity=cap) for p, c in clouds]

    # accumTform chaining (run_toy_example.m:42-80)
    accum = np.eye(4)
    placed = [(clouds[0][0], clouds[0][1])]
    for k in range(1, len(clouds)):
        res = align_jit(MATLAB_PARAMS, padded[k - 1], padded[k])
        tf = np.asarray(res.tf)
        accum = accum @ tf
        print(
            f"pair {k - 1}->{k}: iters={int(res.iterations)} "
            f"|t|={np.linalg.norm(tf[:3, 3]) * 1000:.1f}mm"
        )
        placed.append((transform_points(accum, clouds[k][0]), clouds[k][1]))

    pos, col = merge_clouds(placed, grid=0.01)  # pcmerge analog
    write_ply(out_path, pos, col)
    print(f"stitched scene: {pos.shape[0]} points -> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
