"""bench.py output contract.

The driver runs `python bench.py` at the end of every round and parses
ONE JSON line from it; a crash in `main()` after the measurements (the
round-3 NameError on `engine`, which was local to `run_bench`) would
lose the whole round's bench. This test drives `main()` with
`run_bench` stubbed so the assembly/printing path is exercised without
a device.
"""
import json
import subprocess

import pytest


@pytest.fixture()
def bench(monkeypatch):
    import bench as bench_mod
    # never spawn the CPU-baseline subprocess from a unit test
    monkeypatch.setattr(
        bench_mod.subprocess, 'run',
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError('no subproc')))
    assert bench_mod.subprocess is subprocess  # the module it really uses
    return bench_mod


def _fake_results():
    decomp = {'host_preprocess_ms': 1.3, 'device_step_batch1_ms': 1.9}
    mfu = {'fused_b64_tflops': 0.5, 'fused_b64_mfu_pct': 40.0}
    quant = {'image_int8': 'static', 'bert_int8': 'static'}
    per_config = {'speech_only': 400.0}
    return (288.9, 32.96, 30.0, 6214.0, 7052.0, per_config, decomp, mfu,
            quant)


def test_main_prints_one_json_line_tpu_mode(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, 'MODE', 'tpu')
    monkeypatch.setattr(bench, 'run_bench', _fake_results)
    bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1
    result = json.loads(lines[0])
    assert result['metric'] == 'tri-modal predictions/sec/chip'
    assert result['value'] == 288.9
    assert result['unit'] == 'preds/s'
    # CPU subprocess was stubbed to fail -> vs_baseline degrades to None
    assert result['vs_baseline'] is None
    # every optional section still lands when provided by run_bench
    assert result['image_int8'] == 'static'
    assert result['bert_int8'] == 'static'
    assert result['p50_decomposition']['device_step_batch1_ms'] == 1.9
    assert result['mfu']['fused_b64_mfu_pct'] == 40.0
    assert result['per_modality_preds_per_sec'] == {'speech_only': 400.0}


def test_main_cpu_mode_prints_baseline_line(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, 'MODE', 'cpu')
    monkeypatch.setattr(bench, 'run_bench', _fake_results)
    bench.main()
    result = json.loads(capsys.readouterr().out.strip())
    assert result == {'cpu_batch1_preds_per_sec': 30.0,
                      'cpu_batched_preds_per_sec': 288.9,
                      'cpu_p50_ms': 32.96}
