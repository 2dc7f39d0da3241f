"""Execute the wandb branch of the Logger facade offline (VERDICT r2 #9).

wandb isn't installed in this environment, so the attach/resume/table/image
paths of ``loggers/logger.py::WandbLogger`` had only ever run through the
local logger.  A stub ``wandb`` module injected into sys.modules records
every call, driving the facade's real code paths: login via WANDB_KEY,
``init(resume='allow', id=...)`` (parity surface:
/root/reference/src/loggers/wandb.py:11-92), metric logs, Table-from-
DataFrame, captioned image batches, resume with an explicit run_id, and the
graceful fallback when wandb raises.
"""

import sys
import types

import numpy as np
import pytest

from sonicdiffusionbayeslab_tpu.loggers.logger import Logger, WandbLogger


class _Run:
    def __init__(self, id):
        self.id = id
        self.finished = False

    def finish(self):
        self.finished = True


def _make_stub(record):
    wandb = types.ModuleType("wandb")

    def login(key=None):
        record.append(("login", key))

    def init(project=None, name=None, id=None, resume=None, config=None):
        record.append(("init", dict(project=project, name=name, id=id,
                                    resume=resume, config=config)))
        return _Run(id)

    def log(data, step=None):
        record.append(("log", data, step))

    class Table:
        def __init__(self, dataframe=None):
            record.append(("table", dataframe.to_dict("list")))

    class Image:
        def __init__(self, arr, caption=None):
            record.append(("image", np.asarray(arr).shape, caption))

    wandb.login = login
    wandb.init = init
    wandb.log = log
    wandb.Table = Table
    wandb.Image = Image
    wandb.util = types.SimpleNamespace(generate_id=lambda: "genid123")
    return wandb


@pytest.fixture()
def stub(monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "wandb", _make_stub(record))
    monkeypatch.setenv("WANDB_KEY", "sekrit")
    return record


def test_facade_drives_wandb_branch(tmp_path, stub):
    lg = Logger(config={"a": 1}, wandb_enable=True, project_name="proj",
                run_name="run", output_root=str(tmp_path))
    assert lg.wandb is not None
    # login happened with the env key; init carried resume="allow" + config
    assert ("login", "sekrit") in stub
    init = next(c[1] for c in stub if c[0] == "init")
    assert init["project"] == "proj" and init["resume"] == "allow"
    assert init["config"] == {"a": 1} and init["id"] == "genid123"
    assert lg.run_id == "genid123"

    lg.log_metrics({"clip_score": 0.3}, step=2)
    assert ("log", {"clip_score": 0.3}, 2) in stub

    lg.log_metrics_into_table({"nfe": [10, 20], "clip": [0.3, 0.31]}, name="final")
    table = next(c[1] for c in stub if c[0] == "table")
    assert table == {"nfe": [10, 20], "clip": [0.3, 0.31]}

    imgs = np.zeros((2, 8, 8, 3), np.uint8)
    lg.log_batch_of_images(imgs, name="batch", captions=["a cat", "a dog"], step=1)
    caps = [c[2] for c in stub if c[0] == "image"]
    assert caps == ["a cat", "a dog"]

    lg.finish()


def test_resume_uses_given_run_id(tmp_path, stub):
    """The reference's resume semantics (wandb.py:15-21): an explicit run_id
    is passed straight into init so a rerun appends to the same dashboard."""
    lg = Logger(wandb_enable=True, run_id="resume-me", output_root=str(tmp_path))
    init = next(c[1] for c in stub if c[0] == "init")
    assert init["id"] == "resume-me" and init["resume"] == "allow"
    assert lg.run_id == "resume-me"


def test_wandb_failure_falls_back_to_local(tmp_path, monkeypatch):
    broken = types.ModuleType("wandb")

    def boom(*a, **k):
        raise RuntimeError("no network")

    broken.login = boom
    broken.init = boom
    broken.util = types.SimpleNamespace(generate_id=lambda: "x")
    monkeypatch.setitem(sys.modules, "wandb", broken)
    monkeypatch.setenv("WANDB_KEY", "k")
    lg = Logger(wandb_enable=True, output_root=str(tmp_path))
    assert lg.wandb is None  # degraded loudly, run continues on local
    lg.log_metrics({"m": 1.0})
    events = (lg.local.dir / "events.jsonl").read_text()
    assert "wandb_unavailable" in events and '"m": 1.0' in events
    lg.finish()


def test_no_login_without_key(tmp_path, monkeypatch):
    record = []
    monkeypatch.setitem(sys.modules, "wandb", _make_stub(record))
    monkeypatch.delenv("WANDB_KEY", raising=False)
    WandbLogger("p", "r")
    assert not any(c[0] == "login" for c in record)  # login gated on env key
    assert any(c[0] == "init" for c in record)
