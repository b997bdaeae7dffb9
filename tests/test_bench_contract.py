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
def bench(monkeypatch, tmp_path):
    import bench as bench_mod
    # never spawn the CPU-baseline subprocess from a unit test
    monkeypatch.setattr(
        bench_mod.subprocess, 'run',
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError('no subproc')))
    assert bench_mod.subprocess is subprocess  # the module it really uses
    # the full-results sidecar lands in tmp, not the repo root
    monkeypatch.setattr(bench_mod, 'FULL_RESULTS_PATH',
                        str(tmp_path / 'bench_full.json'))
    return bench_mod


def _fake_results():
    decomp = {'host_preprocess_ms': 1.3, 'device_step_batch1_ms': 1.9,
              'b1_phases_ms': {'wav_load': 0.2, 'dispatch_fetch': 28.0},
              'b1_phases_sum_ms': 32.4,
              'residual_unattributed_ms': 0.56}
    mfu = {'b32': {'speech': {'mfu_pct': 2.1, 'bound': 'bandwidth'}},
           'b64': {'speech': {'mfu_pct': 2.4, 'bound': 'bandwidth'}}}
    quant = {'image_int8': 'static', 'bert_int8': 'static'}
    per_config = {'speech_only': 400.0}
    return {'throughput': 288.9, 'window_rates': [120.0, 288.9, 250.0],
            'p50': 32.96, 'batch1_rate': 30.0, 'device_rate': 6214.0,
            'device_rate_b64': 7052.0, 'per_config': per_config,
            'decomp': decomp, 'mfu': mfu, 'quant': quant}


def test_main_prints_one_json_line_tpu_mode(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, 'MODE', 'tpu')
    monkeypatch.setattr(bench, 'run_bench', _fake_results)
    bench.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1
    # round 4's record was lost to the driver's ~2 KB stdout tail
    # capture truncating the line mid-JSON: the printed line must stay
    # compact, with the large sections in the bench_full.json sidecar
    assert len(lines[0]) <= 1500
    result = json.loads(lines[0])
    # the headline is the ROBUST chip number (device step), with the
    # tunnel-bound e2e rate as a labeled range beside it
    assert result['metric'] == 'tri-modal device-step preds/s/chip (b32)'
    assert result['value'] == 6214.0
    assert result['unit'] == 'preds/s'
    assert result['e2e_preds_per_sec'] == 288.9
    assert result['e2e_window_range'] == [120.0, 288.9]
    # CPU subprocess was stubbed to fail -> vs_baseline degrades to None
    assert result['vs_baseline'] is None
    assert result['device_step_vs_cpu_e2e'] is None
    assert result['image_int8'] == 'static'
    assert result['bert_int8'] == 'static'
    # the heavyweight sections live ONLY in the sidecar
    for heavy in ('p50_decomposition', 'mfu', 'per_modality_preds_per_sec'):
        assert heavy not in result
    assert result['full_results'] == 'bench_full.json'
    with open(bench.FULL_RESULTS_PATH) as f:
        full = json.load(f)
    assert full['p50_decomposition']['device_step_batch1_ms'] == 1.9
    assert full['p50_decomposition']['b1_phases_sum_ms'] == 32.4
    assert full['p50_decomposition']['residual_unattributed_ms'] == 0.56
    assert full['mfu']['b32']['speech']['bound'] == 'bandwidth'
    assert full['per_modality_preds_per_sec'] == {'speech_only': 400.0}


def test_impossible_hbm_pct_is_relabeled(bench, monkeypatch, capsys):
    """No published stage may claim >105% HBM-bandwidth utilization:
    round 4 published 231.9% (logical bytes / paper peak) and its
    compute-vs-bandwidth labels were untrustworthy. A stage whose
    modeled pct still exceeds 105 gets an explicit bw-model-error label
    instead of a bound verdict."""
    monkeypatch.setattr(bench, 'MODE', 'tpu')
    fake = _fake_results()
    fake['mfu'] = {
        'b32': {'speech': {'mfu_pct': 25.0, 'hbm_bw_pct': 231.9,
                           'bound': 'bandwidth'},
                'image': {'mfu_pct': 30.0, 'hbm_bw_pct': 55.0,
                          'bound': 'bandwidth'}},
        'measured_hbm_gbps': 705.8,
    }
    monkeypatch.setattr(bench, 'run_bench', lambda: fake)
    bench.main()
    result = json.loads(capsys.readouterr().out.strip())
    assert result['measured_hbm_gbps'] == 705.8
    with open(bench.FULL_RESULTS_PATH) as f:
        full = json.load(f)
    b32 = full['mfu']['b32']
    assert b32['speech']['bound'] == 'bw-model-error'
    assert b32['image']['bound'] == 'bandwidth'  # sane stage untouched
    for st in b32.values():
        assert st['hbm_bw_pct'] <= 105 or st['bound'] == 'bw-model-error'


def test_main_falls_back_to_e2e_headline_without_device_rate(
        bench, monkeypatch, capsys):
    """Deadline hit before the device-rate section: the e2e rate is the
    only number left and becomes the headline again."""
    monkeypatch.setattr(bench, 'MODE', 'tpu')
    fake = _fake_results()
    fake['device_rate'] = fake['device_rate_b64'] = None
    monkeypatch.setattr(bench, 'run_bench', lambda: fake)
    bench.main()
    result = json.loads(capsys.readouterr().out.strip())
    assert result['metric'] == 'tri-modal predictions/sec/chip'
    assert result['value'] == 288.9


def test_main_cpu_mode_prints_baseline_line(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, 'MODE', 'cpu')
    monkeypatch.setattr(bench, 'run_bench', _fake_results)
    bench.main()
    result = json.loads(capsys.readouterr().out.strip())
    assert result == {'cpu_batch1_preds_per_sec': 30.0,
                      'cpu_batched_preds_per_sec': 288.9,
                      'cpu_p50_ms': 32.96}


def test_b1_phases_sum_to_call_wall_time(tmp_path):
    """The engine's batch-1 tri-modal path times every internal phase
    (engine._last_b1_phases); their sum must account for the whole call
    — bench.py's p50 decomposition is these phases, measured in the
    SAME window as the p50 itself (round-3 VERDICT item 6)."""
    import os
    import time

    import numpy as np

    from mec_tpu.serving.synthetic_artifacts import write_synthetic_artifacts
    from mec_tpu.ops import wav as wav_ops
    from PIL import Image
    from tests.test_perf_mode import _engine

    write_synthetic_artifacts(str(tmp_path), tiny=True, image_size=32)
    engine = _engine(str(tmp_path), 'float32')
    wav_path = os.path.join(str(tmp_path), 'c.wav')
    wav_ops.write_wav(wav_path, (np.sin(np.arange(66150) / 25.0)
                                 * 0.2).astype(np.float32), 22050)
    img_path = os.path.join(str(tmp_path), 'c.jpg')
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (32, 32, 3), np.uint8)).save(img_path)
    text = 'i am so happy today'
    engine.predict_multimodal(wav_path, text, img_path)  # compile
    walls, sums = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        out = engine.predict_multimodal(wav_path, text, img_path)
        walls.append((time.perf_counter() - t0) * 1e3)
        assert engine._last_b1_phases, 'batch-1 path did not record phases'
        sums.append(sum(engine._last_b1_phases.values()))
    assert 'fusion' in out
    expected = {'wav_load', 'tokenize', 'image_load', 'wire_encode',
                'dispatch_fetch', 'result_unpack'}
    assert set(engine._last_b1_phases) == expected
    wall, tot = float(np.median(walls)), float(np.median(sums))
    # the residual is only the engine-call overhead (arg checks, the
    # fallback try frame): sub-ms even on a loaded CPU host
    assert abs(wall - tot) < max(1.0, 0.15 * wall), (wall, tot)
