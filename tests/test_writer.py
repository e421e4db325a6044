"""Event writer: buffered events flush to JSONL (+ TensorBoard when

available) with running-average time tracking (reference parity:
rmvd/utils/writer.py:31-398)."""

import json
import time

from robustmvd_tpu.utils import writer


def test_writer_jsonl_flush(tmp_path):
    writer.setup_writers(log_tensorboard=False, out_dir=str(tmp_path))
    writer.put_scalar("a/b", 1.5, step=0)
    writer.put_scalar_dict("metrics", {"x": 1.0, "y": 2.0}, step=1)
    with writer.TimeWriter("t/iter", step=2, avg_over_steps=True):
        time.sleep(0.01)
    writer.write_out_storage()

    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    names = {l["name"] for l in lines}
    assert "a/b" in names
    assert "metrics/x" in names and "metrics/y" in names
    assert "t/iter" in names and "t/iter_avg" in names
    assert [l for l in lines if l["name"] == "a/b"][0]["value"] == 1.5


def test_tensorboard_backend(tmp_path):
    writer.setup_writers(log_tensorboard=True, out_dir=str(tmp_path))
    writer.put_scalar("s", 3.0, step=0)
    writer.put_histogram("h", [1.0, 2.0, 3.0], step=0)
    writer.write_out_storage()
    files = list(tmp_path.iterdir())
    assert any("tfevents" in f.name for f in files) or (tmp_path / "events.jsonl").exists()
