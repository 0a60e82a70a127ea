"""Outage-proofing guards in bench.py (VERDICT r3 item 1).

The r3 driver bench timed out with no metric because backend init ran
before the watchdog and a failed axon init silently fell back to CPU.
These tests pin the guard behaviors: stale-metric emission, last-good
selection, unconditional persistence, and the implicit-CPU bail-out.
"""

import json
import os
import sys
import time

import pytest

import bench


@pytest.fixture()
def bench_env(tmp_path, monkeypatch):
    # main() installs a tee over stderr; make pytest restore it
    monkeypatch.setattr(sys, "stderr", sys.stderr)
    monkeypatch.setattr(bench, "ROOT", str(tmp_path))
    monkeypatch.setattr(bench, "_JSON_PATHS",
                        [str(tmp_path / "result" / "bench_test.json")])
    monkeypatch.setattr(bench, "_LOG_PATH",
                        str(tmp_path / "result" / "bench_test.log"))
    (tmp_path / "result").mkdir()
    return tmp_path


def _write_metric(path, value, gate=None, stale=False, mtime=None):
    obj = {"metric": "render_fps_800x800", "value": value, "unit": "fps",
           "vs_baseline": round(value / 5.0, 3)}
    if gate:
        obj["gate"] = gate
    if stale:
        obj["stale"] = True
    path.write_text(json.dumps(obj) + "\n")
    if mtime is not None:
        os.utime(path, (mtime, mtime))


def test_emit_obj_persists_and_prints(bench_env, capsys):
    bench._emit_obj({"metric": "render_fps_800x800", "value": 2.0,
                     "unit": "fps", "vs_baseline": 0.4})
    out = capsys.readouterr().out.strip()
    assert json.loads(out)["value"] == 2.0
    with open(bench._JSON_PATHS[0]) as f:
        assert json.loads(f.readline())["value"] == 2.0
    hist = bench_env / "result" / "bench_history.jsonl"
    assert json.loads(hist.read_text())["value"] == 2.0


def test_last_good_skips_stale_and_dense_fallback(bench_env):
    r = bench_env / "result"
    now = time.time()
    _write_metric(r / "bench_old.json", 1.13, mtime=now - 300)
    _write_metric(r / "bench_fallback.json", 1.9,
                  gate={"kind": "dense-fallback"}, mtime=now - 100)
    _write_metric(r / "bench_badrun.json", 0.023, mtime=now - 50)
    _write_metric(r / "bench_stale.json", 3.0, stale=True, mtime=now)
    best = bench._last_good_metric()
    assert best is not None and best["value"] == 1.13


def test_last_good_skips_cpu_smokes(bench_env):
    """A CPU smoke at 64^2 must never be replayed as 'last good'."""
    r = bench_env / "result"
    now = time.time()
    _write_metric(r / "bench_tpu.json", 1.705, mtime=now - 300)
    smoke = {"metric": "render_fps_800x800", "value": 0.67, "unit": "fps",
             "vs_baseline": 0.134, "platform": "cpu", "size": 64}
    (r / "bench_smoke.json").write_text(json.dumps(smoke) + "\n")
    best = bench._last_good_metric()
    assert best is not None and best["value"] == 1.705


def test_emit_stale_zeroes_primary_carries_last_good(bench_env, capsys):
    """ADVICE r4: a stale emission must be unmistakable — primary
    value/vs_baseline are 0.0; the old number rides in last_good_*."""
    _write_metric(bench_env / "result" / "bench_prev.json", 1.705,
                  gate={"kind": "gt-drop"})
    bench._emit_stale("tunnel down")
    obj = json.loads(capsys.readouterr().out.strip())
    assert obj["stale"] is True
    assert obj["value"] == 0.0 and obj["vs_baseline"] == 0.0
    assert obj["last_good_value"] == 1.705
    assert obj["last_good_ts"] > 0
    assert obj["stale_reason"] == "tunnel down"


def test_emit_stale_zero_when_no_history(bench_env, capsys):
    bench._emit_stale("tunnel down")
    obj = json.loads(capsys.readouterr().out.strip())
    assert obj["value"] == 0.0 and obj["stale"] is True
    assert "last_good_value" not in obj


def test_main_bails_on_backend_failure(bench_env, monkeypatch, capsys):
    _write_metric(bench_env / "result" / "bench_prev.json", 1.764,
                  gate={"kind": "gt-drop"})
    monkeypatch.setattr(bench, "_probe_backend", lambda: None)
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip())
    assert obj["stale"] is True and obj["value"] == 0.0
    assert obj["last_good_value"] == 1.764


def test_main_bails_on_implicit_cpu_fallback(bench_env, monkeypatch,
                                             capsys):
    """sitecustomize sets jax_platforms='axon,cpu'; when axon init fails
    JAX lands on cpu with no env trace — bench must not start a dense
    800^2 gate render there."""
    monkeypatch.setattr(bench, "_probe_backend", lambda: "cpu")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("BENCH_ALLOW_CPU", raising=False)
    bench.main()
    obj = json.loads(capsys.readouterr().out.strip())
    assert obj["stale"] is True
    assert "cpu" in obj["stale_reason"].lower()


def test_main_allows_explicit_cpu(bench_env, monkeypatch):
    """JAX_PLATFORMS=cpu (our own smoke runs) must still run the bench."""
    monkeypatch.setattr(bench, "_probe_backend", lambda: "cpu")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("BENCH_MODEL", "freq")
    ran = {}
    monkeypatch.setattr(bench, "run_freq",
                        lambda watchdog: ran.setdefault("freq", True))
    bench.main()
    assert ran.get("freq")


def test_tee_stderr_delegates_stream_api(bench_env):
    """Libraries probe isatty()/encoding/fileno on stderr (warnings,
    absl, tqdm); the tee must expose the full file API (ADVICE r4)."""
    tee = bench._TeeStderr(str(bench_env / "result" / "tee.log"))
    assert tee.isatty() == sys.stderr.isatty()
    assert tee.encoding == sys.stderr.encoding
    tee.write("x")
    tee.flush()


def test_watchdog_fire_always_exits():
    """The watchdog body must reach os._exit even if the stale emission
    raises (ADVICE r4): a dead timer thread would hang the driver."""
    src = open(os.path.join(os.path.dirname(bench.__file__),
                            "bench.py")).read()
    i = src.index("def fire():")
    body = src[i:src.index("t = threading.Timer")]
    assert "finally:" in body and "os._exit(3)" in body


def test_watchdog_default_below_driver_timeout(monkeypatch):
    """r3's driver killed the bench at ~25 min while the internal
    watchdog default was 50 min; the default must stay <= 1200 s."""
    monkeypatch.delenv("BENCH_TIMEOUT", raising=False)
    src = open(os.path.join(os.path.dirname(bench.__file__),
                            "bench.py")).read()
    assert '"BENCH_TIMEOUT", "1200"' in src


def test_ladder_has_v2_intermediate_steps():
    """The r5 freq_rm run passed only at 32,14,12 (0.230 s/frame)
    because 32,10,10 missed the 0.2 dB budget by 0.12 dB; the default
    ladder must keep the cheaper intermediate steps in between."""
    src = open(os.path.join(os.path.dirname(bench.__file__),
                            "bench.py")).read()
    i = src.index('"BENCH_NGP_LADDER"')
    default = src[i:i + 200]
    assert "32,10,10" in default
    assert "32,12,10" in default and "32,12,12" in default
    assert "32,14,12" in default


def test_ladder_cache_keyed_by_ladder_string():
    """Inserting a new intermediate ladder step must invalidate the
    cached passing step, or the walk would resume at a coarser pass and
    never try the cheaper step."""
    src = open(os.path.join(os.path.dirname(bench.__file__),
                            "bench.py")).read()
    i = src.index('lad_cache = _cache_path(')
    call = src[i:i + 300]
    assert "ladder_env)" in call
