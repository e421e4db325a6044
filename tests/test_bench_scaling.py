"""Smoke-run bench_scaling.py on the virtual 8-device CPU mesh.

The scaling bench is part of the perf tooling (BASELINE.md north star:
>=80% linear scaling on ICI); this pins that its sharded measurement path
— mesh construction, device_put with a data-axis NamedSharding, the jitted
forward under use_mesh, and the efficiency arithmetic — builds and runs at
every device count without needing a multi-chip slice.
"""

import argparse
import json
import sys
import os.path as osp

import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


@pytest.mark.slow
def test_bench_scaling_smoke_on_cpu_mesh(capsys):
    import bench_scaling

    args = argparse.Namespace(
        height=64,
        width=128,
        per_device_batch=1,
        iters=1,
        platform="cpu",
        num_sampling_points=8,
    )
    bench_scaling.main(args)

    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    entries = [json.loads(l) for l in lines]
    by_n = {e["devices"]: e for e in entries}
    assert set(by_n) == {1, 2, 4, 8}, by_n.keys()
    for n, e in by_n.items():
        assert e["metric"] == f"robust_mvd_fwd_scaling_n{n}"
        assert e["unit"] == "frames/s"
        assert e["value"] > 0
        assert 0 < e["scaling_efficiency"] <= 1.5  # n=1 is exactly 1.0
    assert by_n[1]["scaling_efficiency"] == 1.0
