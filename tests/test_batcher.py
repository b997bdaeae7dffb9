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


def test_pipeline_overlaps_batches():
    """With pipeline_depth=2 the collector dispatches batch N+1 while
    batch N is still inside fn (host prep overlapping the device round
    trip); depth=1 keeps the old serial behavior."""
    first_entered = threading.Event()
    second_entered = threading.Event()
    release_first = threading.Event()
    calls = []
    lock = threading.Lock()

    def fn(items):
        with lock:
            calls.append(list(items))
            n = len(calls)
        if n == 1:
            first_entered.set()
            assert release_first.wait(5)
        else:
            second_entered.set()
        return list(items)

    q = BatchQueue(fn, max_batch=8, timeout_s=0.0, pipeline_depth=2)
    try:
        t1 = threading.Thread(target=q.submit, args=(1,))
        t1.start()
        assert first_entered.wait(5)
        t2 = threading.Thread(target=q.submit, args=(2,))
        t2.start()
        # second batch runs to completion while the first is still blocked
        assert second_entered.wait(5), \
            'batch 2 did not start while batch 1 was in flight'
        release_first.set()
        t1.join(5)
        t2.join(5)
    finally:
        release_first.set()
        q.stop()
    assert sorted(sum(calls, [])) == [1, 2]


def test_pipeline_depth_one_is_serial():
    in_flight = []
    max_in_flight = []
    lock = threading.Lock()

    def fn(items):
        with lock:
            in_flight.append(1)
            max_in_flight.append(len(in_flight))
        time.sleep(0.02)
        with lock:
            in_flight.pop()
        return list(items)

    q = BatchQueue(fn, max_batch=1, timeout_s=0.0, pipeline_depth=1)
    try:
        threads = [threading.Thread(target=q.submit, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        q.stop()
    assert max(max_in_flight) == 1


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


def test_adaptive_linger_coalesces_staggered_arrivals():
    """Arrivals spaced wider than one timeout slice but landing within
    each successive slice keep the linger alive (up to max_linger_s) and
    coalesce into one deep batch — the measured-win behavior on the v5e
    HTTP path (BASELINE.md 'Concurrent HTTP serving')."""
    calls = []

    def fn(items):
        calls.append(len(items))
        return list(items)

    q = BatchQueue(fn, max_batch=64, timeout_s=0.02, max_linger_s=2.0)
    results = {}
    try:
        def worker(i):
            time.sleep(0.005 * i)  # staggered over ~50 ms > one slice
            results[i] = q.submit(i)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        q.stop()
    assert results == {i: i for i in range(10)}
    # a fixed 20 ms linger would have split this into several batches;
    # the adaptive extension forms one (allow 2 for scheduler jitter)
    assert q.batches_run <= 2
    assert max(calls) >= 8


def test_sparse_traffic_flushes_after_one_slice_not_the_cap():
    """A lone request must NOT wait out max_linger_s: with no new
    arrivals during its first slice, it flushes immediately."""
    q = BatchQueue(lambda items: list(items), timeout_s=0.005,
                   max_linger_s=10.0)
    try:
        t0 = time.perf_counter()
        assert q.submit('x') == 'x'
        elapsed = time.perf_counter() - t0
    finally:
        q.stop()
    assert elapsed < 1.0, f'lone submit lingered {elapsed:.2f}s'


def test_linger_cap_bounds_continuous_stream():
    """A continuous arrival stream cannot pin the collector forever:
    the max_linger_s deadline flushes a batch even while new items keep
    landing every slice."""
    q = BatchQueue(lambda items: list(items), max_batch=10_000,
                   timeout_s=0.01, max_linger_s=0.05)
    stop = threading.Event()
    done = []
    try:
        def feeder():
            while not stop.is_set():
                done.append(q.submit(0))

        threads = [threading.Thread(target=feeder) for _ in range(4)]
        for t in threads:
            t.start()
        time.sleep(0.6)
        stop.set()
        for t in threads:
            t.join(timeout=10)
    finally:
        q.stop()
    # the stream ran ~0.6 s against a 50 ms cap: many batches flushed
    assert q.batches_run >= 5
    assert len(done) == q.items_run


def test_overload_sheds_when_pending_bound_hit():
    """Load shedding: once max_pending items are queued, submit raises
    BatchOverloaded instead of growing the queue (the webapp surfaces
    503 + Retry-After)."""
    from mec_tpu.serving.batcher import BatchOverloaded

    def slow(items):
        time.sleep(0.4)
        return list(items)

    q = BatchQueue(slow, max_batch=1, timeout_s=0.001, pipeline_depth=1,
                   max_pending=2)
    results, shed = [], []
    try:
        def worker(i):
            try:
                results.append(q.submit(i))
            except BatchOverloaded:
                shed.append(i)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
            time.sleep(0.05)
        for t in threads:
            t.join()
    finally:
        q.stop()
    # 6 arrivals at 50 ms spacing vs 400 ms/batch and a 2-deep queue:
    # some must be shed, the rest must be answered
    assert shed, 'expected at least one shed request'
    assert len(results) + len(shed) == 6


def test_max_pending_zero_disables_shedding():
    q = BatchQueue(lambda items: list(items), max_batch=64,
                   timeout_s=0.01, max_pending=0)
    try:
        assert [q.submit(i) for i in range(100)] == list(range(100))
    finally:
        q.stop()
