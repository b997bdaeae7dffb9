"""Micro-batcher tests: coalescing, ordering, error propagation."""

import threading
import time

from mec_tpu.serving.batcher import BatchQueue


def test_results_match_items():
    q = BatchQueue(lambda items: [x * 2 for x in items], timeout_s=0.01)
    try:
        assert q.submit(21) == 42
        assert q.submit(5) == 10
    finally:
        q.stop()


def test_concurrent_submissions_coalesce():
    calls = []

    def fn(items):
        calls.append(len(items))
        return [x + 1 for x in items]

    q = BatchQueue(fn, max_batch=64, timeout_s=0.05)
    results = {}
    try:
        def worker(i):
            results[i] = q.submit(i)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        q.stop()
    assert results == {i: i + 1 for i in range(16)}
    # 16 concurrent submissions within the 50 ms window ran in few batches
    assert q.items_run == 16
    assert q.batches_run <= 3
    assert max(calls) > 1


def test_max_batch_respected():
    sizes = []

    def fn(items):
        sizes.append(len(items))
        time.sleep(0.01)
        return list(items)

    q = BatchQueue(fn, max_batch=4, timeout_s=0.05)
    try:
        threads = [threading.Thread(target=q.submit, args=(i,))
                   for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        q.stop()
    assert max(sizes) <= 4
    assert sum(sizes) == 10


def test_error_propagates_to_submitters():
    q = BatchQueue(lambda items: 1 / 0, timeout_s=0.0)
    try:
        try:
            q.submit('x')
            assert False, 'expected ZeroDivisionError'
        except ZeroDivisionError:
            pass
    finally:
        q.stop()


def test_engine_batcher_text_route():
    from mec_tpu.serving.batcher import EngineBatcher
    from mec_tpu.serving.engine import EmotionEngine
    engine = EmotionEngine(models_dir='/nonexistent-models-dir')
    b = EngineBatcher(engine, timeout_s=0.0)
    try:
        r = b.text.submit('I am so happy about this')
        assert r['emotion'] == 'happy'
        stats = b.stats()
        assert stats['text']['items'] == 1
    finally:
        b.stop()


def test_stop_during_linger_does_not_hang():
    """stop() while the collector lingers over a pending batch must not
    lose the stop wakeup (regression: the post-drain clear() stranded the
    collector in wait() and stop() hit its 2 s join timeout)."""
    import threading
    import time as _time
    from mec_tpu.serving.batcher import BatchQueue

    def slow_fn(items):
        _time.sleep(0.15)
        return [i for i in items]

    q = BatchQueue(slow_fn, timeout_s=0.1, name='stoprace')
    t = threading.Thread(target=lambda: q.submit(1))
    t.start()
    _time.sleep(0.03)          # collector is now in its linger window
    t0 = _time.perf_counter()
    q.stop()
    elapsed = _time.perf_counter() - t0
    t.join(timeout=2)
    assert elapsed < 1.5, f'stop() hung {elapsed:.1f}s (join timed out)'
    assert not q._thread.is_alive()
