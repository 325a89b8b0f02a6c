"""Smoke tests for bench/watcher.py (VERDICT r5 next #5): the shipped
scaling-campaign methodology must stay parseable and importable without
side effects — no Spark, pure string-in/value-out."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_watcher():
    spec = importlib.util.spec_from_file_location(
        "bench_watcher", os.path.join(REPO, "bench", "watcher.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


watcher = _load_watcher()


def test_import_has_no_side_effects(tmp_path, monkeypatch):
    # importing must not create watcher.log / launch subprocesses
    monkeypatch.chdir(tmp_path)
    _load_watcher()
    assert os.listdir(tmp_path) == []


def test_parse_probe_happy_path():
    out = ("some spark noise\n"
           'PROBE_RESULT {"reps": [2.71, 2.55, 2.6], "min": 2.55}\n')
    assert watcher.parse_probe(out) == 2.55


def test_parse_probe_missing_line_is_failure_not_contention():
    assert watcher.parse_probe("java.lang.OutOfMemoryError\n") is None
    assert watcher.parse_probe("") is None


def test_parse_probe_malformed_json_is_failure():
    assert watcher.parse_probe("PROBE_RESULT {not json}\n") is None
    assert watcher.parse_probe('PROBE_RESULT {"reps": []}\n') is None


def test_parse_campaign_picks_last_summary_line():
    trial = json.dumps({"trial": 0, "low": {"t_apply": 80.0},
                        "high": {"t_apply": 24.0}})
    summary = json.dumps({"scaling_efficiency": 0.81,
                          "t_apply_low": 80.0, "t_apply_high": 24.7,
                          "t_apply_low_all": [80.0],
                          "t_apply_high_all": [24.7]})
    text = f"warmup noise\n{trial}\nRESULT per-run line\n{summary}\n"
    got = watcher.parse_campaign(text)
    assert got is not None
    assert got["scaling_efficiency"] == 0.81
    assert got["t_apply_low"] == 80.0


def test_parse_campaign_no_summary_returns_none():
    assert watcher.parse_campaign("crashed before summary\n{bad json\n") is None
    # trial lines alone (no scaling_efficiency) do not count as a summary
    assert watcher.parse_campaign(json.dumps({"trial": 0, "low": 1})) is None


def test_is_symmetric_accepts_both_sides_near_floors():
    s = {"t_apply_low": 82.0, "t_apply_high": 25.0}
    assert watcher.is_symmetric(s, floor_lo=80.0, floor_hi=24.0)


def test_is_symmetric_rejects_contended_n_side():
    # the campaign-J shape: over-the-bar ratio bought by a hot N side
    s = {"t_apply_low": 97.0, "t_apply_high": 24.3}
    assert not watcher.is_symmetric(s, floor_lo=80.0, floor_hi=24.0)


def test_is_symmetric_rejects_contended_4n_side():
    s = {"t_apply_low": 80.5, "t_apply_high": 30.0}
    assert not watcher.is_symmetric(s, floor_lo=80.0, floor_hi=24.0)


def test_is_symmetric_requires_floors_and_fields():
    assert not watcher.is_symmetric({}, 80.0, 24.0)
    assert not watcher.is_symmetric(
        {"t_apply_low": 80.0, "t_apply_high": 24.0}, None, None)


def test_main_aborts_when_probe_dir_missing(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WATCHER_PROBE_DIR", str(tmp_path / "nope"))
    monkeypatch.setattr(sys, "argv", ["watcher.py", "0.001"])
    watcher.main()
    log = (tmp_path / "watcher.log").read_text()
    assert "ABORT" in log and "probe dir" in log


def test_main_aborts_after_persistent_probe_failures(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WATCHER_PROBE_DIR", str(tmp_path))  # exists
    monkeypatch.setattr(sys, "argv", ["watcher.py", "1.0"])
    monkeypatch.setattr(watcher, "run_probe", lambda d: None)
    monkeypatch.setattr(watcher.time, "sleep", lambda s: None)
    watcher.main()
    log = (tmp_path / "watcher.log").read_text()
    assert f"({watcher.MAX_PROBE_FAILURES}/{watcher.MAX_PROBE_FAILURES})" in log
    assert "probe failing persistently" in log


def test_main_first_campaign_cannot_stop_watcher(tmp_path, monkeypatch):
    """End-to-end loop logic with stubbed probe + campaign: an over-the-bar
    first campaign must NOT stop the watcher (floors uncorroborated); an
    equally good second one must."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WATCHER_PROBE_DIR", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["watcher.py", "1.0"])
    monkeypatch.setattr(watcher, "run_probe", lambda d: 2.4)  # always quiet
    monkeypatch.setattr(watcher.time, "sleep", lambda s: None)

    summary = {"scaling_efficiency": 0.82,
               "t_apply_low": 80.0, "t_apply_high": 24.4,
               "t_apply_low_all": [80.0], "t_apply_high_all": [24.4]}
    launches = []

    def fake_run(cmd, stdout=None, stderr=None, timeout=None, env=None,
                 **kw):
        launches.append(cmd)
        stdout.write(json.dumps(summary) + "\n")

    monkeypatch.setattr(watcher.subprocess, "run", fake_run)
    watcher.main()
    log = (tmp_path / "watcher.log").read_text()
    assert len(launches) == 2          # auto1 rejected, auto2 accepted
    assert "campaign auto1" in log and "symmetric=False" in log
    assert "TARGET MET symmetrically" in log


def test_main_survives_campaign_crash(tmp_path, monkeypatch):
    """ADVICE r5: a crashing/hanging campaign must not kill the watcher."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WATCHER_PROBE_DIR", str(tmp_path))
    monkeypatch.setattr(sys, "argv", ["watcher.py", "1.0"])
    probes = iter([2.4, 99.0])         # quiet once, then contended forever

    def probe(d):
        try:
            return next(probes)
        except StopIteration:
            return 99.0

    monkeypatch.setattr(watcher, "run_probe", probe)
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    def fake_time():
        clock["t"] += 1.0
        return clock["t"]

    monkeypatch.setattr(watcher.time, "sleep", fake_sleep)
    monkeypatch.setattr(watcher.time, "time", fake_time)

    def boom(*a, **k):
        raise watcher.subprocess.TimeoutExpired(cmd="x", timeout=2400)

    monkeypatch.setattr(watcher.subprocess, "run", boom)
    watcher.main()                     # must return, not raise
    log = (tmp_path / "watcher.log").read_text()
    assert "CRASHED/TIMED OUT" in log
    assert "watcher exit" in log


def test_main_seeded_floors_accept_first_campaign(tmp_path, monkeypatch):
    """WATCHER_FLOOR_LO/HI seed the session floors across restarts: a
    symmetric over-the-bar FIRST campaign can stop a seeded watcher
    (the floors are corroborated by the earlier run), and numbering
    continues past existing campaign logs instead of overwriting them."""
    monkeypatch.chdir(tmp_path)
    (tmp_path / "campaign_auto_1.log").write_text("old evidence\n")
    (tmp_path / "campaign_auto_2.log").write_text("old evidence\n")
    monkeypatch.setenv("WATCHER_PROBE_DIR", str(tmp_path))
    monkeypatch.setenv("WATCHER_FLOOR_LO", "80.0")
    monkeypatch.setenv("WATCHER_FLOOR_HI", "24.0")
    monkeypatch.setattr(sys, "argv", ["watcher.py", "1.0"])
    monkeypatch.setattr(watcher, "run_probe", lambda d: 2.4)
    monkeypatch.setattr(watcher.time, "sleep", lambda s: None)

    summary = {"scaling_efficiency": 0.83,
               "t_apply_low": 81.0, "t_apply_high": 24.4,
               "t_apply_low_all": [81.0], "t_apply_high_all": [24.4]}
    launches = []

    def fake_run(cmd, stdout=None, stderr=None, timeout=None, env=None,
                 **kw):
        launches.append(cmd)
        stdout.write(json.dumps(summary) + "\n")

    monkeypatch.setattr(watcher.subprocess, "run", fake_run)
    watcher.main()
    log = (tmp_path / "watcher.log").read_text()
    assert "floors seeded from env: (80.0,24.0)" in log
    assert len(launches) == 1
    assert "campaign auto3" in log          # numbering continued past 2
    assert "TARGET MET symmetrically" in log
    # the pre-existing logs were not overwritten
    assert (tmp_path / "campaign_auto_1.log").read_text() == "old evidence\n"


def test_main_seeded_floors_still_reject_contended_side(tmp_path,
                                                        monkeypatch):
    """Seeding must not weaken the rule: an over-the-bar ratio whose N
    side runs hot against the seeded floor keeps the watcher hunting."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("WATCHER_PROBE_DIR", str(tmp_path))
    monkeypatch.setenv("WATCHER_FLOOR_LO", "80.0")
    monkeypatch.setenv("WATCHER_FLOOR_HI", "24.0")
    monkeypatch.setattr(sys, "argv", ["watcher.py", "0.002"])
    monkeypatch.setattr(watcher, "run_probe", lambda d: 2.4)
    monkeypatch.setattr(watcher.time, "sleep", lambda s: None)

    summary = {"scaling_efficiency": 0.97,
               "t_apply_low": 104.0, "t_apply_high": 26.8,   # N side hot
               "t_apply_low_all": [104.0], "t_apply_high_all": [26.8]}

    def fake_run(cmd, stdout=None, stderr=None, timeout=None, env=None,
                 **kw):
        stdout.write(json.dumps(summary) + "\n")

    monkeypatch.setattr(watcher.subprocess, "run", fake_run)
    watcher.main()
    log = (tmp_path / "watcher.log").read_text()
    assert "symmetric=False" in log
    assert "TARGET MET" not in log
