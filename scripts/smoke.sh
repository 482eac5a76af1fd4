#!/usr/bin/env bash
# CI smoke run — the cvo_test.sh analog (script/cvo_test.sh:1-7):
# registers the vendored fr1/desk fixture clouds end to end and runs
# the unit suite's fast subset.
set -euo pipefail
cd "$(dirname "$0")/.."
python bench.py
python examples/toy_example.py /tmp/toy_scene_smoke.ply
python -m pytest tests/test_core.py tests/test_se3.py -x -q
