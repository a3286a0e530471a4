"""KV logger sinks and aggregation (ref `main/diffusion/logger.py`)."""
import csv
import json
import os

import numpy as np
import pytest

from diffusestylegesture_tpu.train.logger import KVLogger


class TestSinks:
    def test_json_and_csv(self, tmp_path):
        lg = KVLogger(log_dir=str(tmp_path), format_strs=("json", "csv"))
        lg.logkv("loss", 0.5)
        lg.logkv("step", 1)
        lg.dumpkvs()
        lg.logkv("loss", 0.25)
        lg.logkv("step", 2)
        lg.dumpkvs()

        rows = [json.loads(l) for l in open(tmp_path / "progress.json")]
        assert rows[0]["loss"] == 0.5 and rows[1]["loss"] == 0.25
        with open(tmp_path / "progress.csv") as f:
            content = list(csv.reader(f))
        assert len(content) >= 2  # header + rows

    def test_csv_appends_and_expands_keys(self, tmp_path):
        """Append semantics (ref CSVOutputFormat): rows append; a NEW key
        rewrites once with the expanded header; a fresh instance (resume)
        adopts the existing header and keeps appending. The old
        rewrite-everything-per-dump form was quadratic in dumps."""
        from diffusestylegesture_tpu.train.logger import CSVOutput

        p = str(tmp_path / "progress.csv")
        a = CSVOutput(p)
        a.writekvs({"step": 1, "loss": 0.5})
        a.writekvs({"step": 2, "loss": 0.4, "grad": 1.0})  # key expansion
        b = CSVOutput(p)  # resumed run
        b.writekvs({"step": 3, "loss": 0.3})
        rows = list(csv.DictReader(open(p)))
        assert [r["step"] for r in rows] == ["1", "2", "3"]
        assert rows[0]["grad"] == "" and rows[1]["grad"] == "1.0"
        assert rows[2]["loss"] == "0.3"

    def test_tensorboard_sink(self, tmp_path):
        pytest.importorskip("torch.utils.tensorboard")
        lg = KVLogger(log_dir=str(tmp_path), format_strs=("tensorboard",))
        lg.logkv("loss", 1.0)
        lg.logkv("step", 0)
        lg.dumpkvs()
        # event files written
        assert any(f.startswith("events") for f in os.listdir(tmp_path))


class TestAggregation:
    def test_logkv_mean(self):
        lg = KVLogger(format_strs=())
        for v in (1.0, 2.0, 3.0):
            lg.logkv_mean("x", v)
        out = lg.dumpkvs()
        assert out["x"] == pytest.approx(2.0)
        # cleared after dump
        assert lg.dumpkvs().get("x") is None

    def test_loss_quartiles(self):
        """Per-diffusion-quartile means (ref `training_loop.py:350-356`)."""
        lg = KVLogger(format_strs=())
        ts = np.array([0, 250, 500, 999])
        losses = {"loss": np.array([1.0, 2.0, 3.0, 4.0])}
        lg.log_loss_dict(ts, 1000, losses)
        out = lg.dumpkvs()
        assert out["loss"] == pytest.approx(2.5)
        assert out["loss_q0"] == pytest.approx(1.0)
        assert out["loss_q1"] == pytest.approx(2.0)
        assert out["loss_q2"] == pytest.approx(3.0)
        assert out["loss_q3"] == pytest.approx(4.0)
