"""Measure the reference-scale per-iteration slope + isolated-kernel
floor on the real chip (bench.py methodology) — used to A/B kernel and
epilogue changes without running the whole bench."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    from cvo_rgbd_tpu import CvoParams
    from cvo_rgbd_tpu.params import AcvoParams

    for tag, p, hsv in (
        ("cvo", CvoParams(backend="pallas", max_iter=200,
                          eps=5e-4, eps_2=1e-4), False),
        ("acvo", AcvoParams(backend="pallas", max_iter=200,
                            eps=5e-4, eps_2=1e-4), True),
    ):
        fixed, moving, _ = bench.synth_reference_scale(hsv_scale=hsv)
        per_iter = bench._per_iteration_slope(p, fixed, moving)
        floor = bench._isolated_moment_sweep_us(
            p, fixed, moving, adaptive=(tag == "acvo")
        )
        print(f"{tag}: {per_iter * 1e3:.4f} ms/iter  floor {floor:.1f} us"
              f"  attainment {100 * floor / (per_iter * 1e6):.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
