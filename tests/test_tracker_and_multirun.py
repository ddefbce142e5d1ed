"""Tracker artifact format + multirun override expansion."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from main import _expand_multirun  # noqa: E402
from siss_tpu.utils import Tracker  # noqa: E402


def test_tracker_jsonl_and_summary(tmp_path):
    tr = Tracker("proj", str(tmp_path), logger="jsonl", config={"a": 1})
    tr.log({"loss_x/mean": np.float32(0.5), "vec": np.array([1.0, 2.0])}, step=3)
    tr.log_summary("deletion_steps", 7)
    tr.log_images("Sampled Images", np.zeros((2, 4, 4, 1)), step=3)
    tr.finish()

    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["loss_x/mean"] == 0.5
    assert rows[0]["vec"] == [1.0, 2.0]        # arrays serialize as lists
    assert rows[0]["_step"] == 3
    summary = json.load(open(tmp_path / "summary.json"))
    assert summary["deletion_steps"] == 7
    assert json.load(open(tmp_path / "config.json")) == {"a": 1}
    imgs = os.listdir(tmp_path / "images")
    assert len(imgs) == 2 and all(i.endswith(".png") for i in imgs)


def test_tracker_non_main_process_is_noop(tmp_path):
    tr = Tracker("proj", str(tmp_path / "x"), main_process=False)
    tr.log({"a": 1})
    tr.log_summary("k", 1)
    tr.finish()
    assert not os.path.exists(tmp_path / "x")


def test_expand_multirun():
    jobs = list(_expand_multirun(["a=1,2", "b=x", "c=[1,2]"]))
    assert jobs == [["a=1", "b=x", "c=[1,2]"], ["a=2", "b=x", "c=[1,2]"]]
    # no commas → single job
    assert list(_expand_multirun(["a=1"])) == [["a=1"]]
