"""Config/zklog/timers/watchdog unit tests (reference L1 layer)."""

import json
import os
import time

from zkevm_prover_tpu.utils import Config, TimeMetricStorage, Watchdog, timer


def test_config_defaults_and_json(tmp_path):
    cfg = Config.load()
    assert cfg.proverName == "zkevm-prover-tpu"
    assert cfg.check() == []

    p = tmp_path / "config.json"
    p.write_text(json.dumps({
        "runExecutorServer": True,
        "executorServerPort": 12345,
        "someUnknownKey": "kept",
    }))
    cfg2 = Config.load(str(p))
    assert cfg2.runExecutorServer is True
    assert cfg2.executorServerPort == 12345
    assert cfg2.extra["someUnknownKey"] == "kept"
    # round-trips through JSON
    again = json.loads(cfg2.to_json())
    assert again["executorServerPort"] == 12345


def test_config_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("EXECUTOR_SERVER_PORT", "777")
    monkeypatch.setenv("RUN_EXECUTOR_SERVER", "true")
    cfg = Config.load()
    assert cfg.executorServerPort == 777
    assert cfg.runExecutorServer is True


def test_config_check_catches_bad_port():
    cfg = Config.load()
    cfg.executorServerPort = 0
    assert any("executorServerPort" in e for e in cfg.check())


def test_time_metric_storage():
    st = TimeMetricStorage("test")
    with timer("opA", st, log=False):
        pass
    with timer("opA", st, log=False):
        pass
    with timer("opB", st, log=False):
        pass
    snap = st.snapshot()
    assert snap["opA"]["count"] == 2
    assert snap["opB"]["count"] == 1


def test_watchdog_fires_and_kick_defers():
    fired = []
    wd = Watchdog(0.15, lambda: fired.append(1))
    wd.start()
    for _ in range(3):
        time.sleep(0.05)
        wd.kick()
    assert fired == []
    time.sleep(0.3)
    assert fired == [1]
    wd.stop()
