"""Utility-layer tests: metrics writer, step timer, logging, colorize."""
import json
import os

import numpy as np

from gfs3dseg_gws_tpu.utils.logging import AverageMeter, IOStream, init_logger
from gfs3dseg_gws_tpu.utils.observability import MetricsWriter, StepTimer
from gfs3dseg_gws_tpu.utils.visual import colorize, labeled_pointcloud


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.scalar("Train/loss", 1.5, 0)
    w.scalar("Train/loss", 1.2, 1)
    w.close()
    lines = [json.loads(line) for line in
             open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert [r["value"] for r in lines] == [1.5, 1.2]
    assert all(r["tag"] == "Train/loss" for r in lines)


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=2)
    import time

    for _ in range(5):
        with t:
            time.sleep(0.01)
    assert 0.005 < t.mean < 0.1
    assert t.count == 5


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.avg == (2.0 + 12.0) / 4


def test_iostream_appends_and_mirrors(tmp_path, capsys):
    path = os.path.join(str(tmp_path), "log_test.txt")
    s = IOStream(path)
    s.cprint("hello")
    s.close()
    s2 = IOStream(path)
    s2.cprint("world")
    s2.close()
    assert open(path).read() == "hello\nworld\n"
    assert "hello" in capsys.readouterr().out


def test_init_logger_dumps_args(tmp_path):
    logger = init_logger(str(tmp_path), {"b": 2, "a": 1}, phase="unit")
    logger.close()
    text = open(os.path.join(str(tmp_path), "log_unit.txt")).read()
    assert text.index("a: 1") < text.index("b: 2")  # sorted


def test_colorize_shapes():
    lab = np.array([[0, 1], [12, 25]])
    c = colorize(lab)
    assert c.shape == (2, 2, 3) and c.dtype == np.uint8
    pc = labeled_pointcloud(np.zeros((4, 3)), np.arange(4))
    assert pc.shape == (4, 6)
