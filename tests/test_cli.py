"""CLI argument parsing and evaluation subcommand smoke tests."""

import numpy as np
import pytest

from cvo_rgbd_tpu import cli

from test_odometry import synth_dataset, NUM_WANT  # noqa: F401  (fixture)


def test_help_lists_subcommands(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--help"])
    out = capsys.readouterr().out
    for cmd in ["run", "batch", "stitch", "evaluate-ate", "evaluate-rpe", "associate"]:
        assert cmd in out


def test_evaluate_ate_cli(tmp_path, capsys):
    gt = tmp_path / "gt.txt"
    est = tmp_path / "est.txt"
    lines = []
    for i in range(10):
        lines.append(f"{100 + i * 0.1:.6f} {0.01 * i:.6f} 0 0 0 0 0 1")
    gt.write_text("\n".join(lines) + "\n")
    est.write_text("\n".join(lines) + "\n")
    cli.main(["evaluate-ate", str(gt), str(est)])
    out = capsys.readouterr().out.strip()
    assert float(out) < 1e-10


def test_associate_cli(tmp_path, capsys):
    a = tmp_path / "rgb.txt"
    b = tmp_path / "depth.txt"
    a.write_text("# rgb\n1.00 rgb/1.png\n2.00 rgb/2.png\n")
    b.write_text("# depth\n1.01 depth/1.png\n2.015 depth/2.png\n")  # < 0.02 strictly
    cli.main(["associate", str(a), str(b)])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    assert "rgb/1.png" in out[0] and "depth/1.png" in out[0]


def test_unknown_command_errors():
    with pytest.raises(SystemExit):
        cli.main(["frobnicate"])


def test_multiseq_cli(synth_dataset, capsys):
    """multiseq subcommand: lockstep batched odometry over folders."""
    cli.main([
        "multiseq", "1", str(synth_dataset), "--num-want", str(NUM_WANT),
        "--max-frames", "3",
    ])
    traj = synth_dataset / "cvo_poses_qt_batch.txt"
    assert traj.exists()
    lines = traj.read_text().strip().splitlines()
    assert len(lines) >= 2
    assert all(len(l.split()) == 8 for l in lines)


def test_slam_cli(tmp_path, capsys, rng):
    """slam subcommand: synthetic pcd dir -> TUM trajectory file."""
    from cvo_rgbd_tpu.io.export import write_pcd

    world = (rng.standard_normal((300, 3)) * 0.5 + [0, 0, 2.0]).astype(np.float32)
    col = (rng.random((300, 3)) * 255).astype(np.float32)
    for i in range(3):
        T = np.eye(4); T[:3, 3] = [0.02 * i, 0, 0]
        local = (world - T[:3, 3]) @ T[:3, :3]
        write_pcd(str(tmp_path / f"10{i}.500000.pcd"), local, col)
    out = tmp_path / "traj.txt"
    cli.main(["slam", str(tmp_path), "--output", str(out), "--grid", "0.3"])
    printed = capsys.readouterr().out
    assert "keyframes" in printed
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 3
    assert lines[0].startswith("100.500000 ")
    # 8 TUM fields per line
    assert all(len(l.split()) == 8 for l in lines)
