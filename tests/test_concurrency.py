"""Optimistic concurrency: parallel writers against one LakeTable must
serialize through version conflicts without losing a commit (the os.link
put-if-absent contract; reference relies on delta-rs's equivalent)."""

from __future__ import annotations

import threading

import pytest

from mongodb_cdc_delta_spark.sinks import ConcurrentWriteError, LakeTable


def test_parallel_appenders_lose_no_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    n_threads, appends_each = 4, 3
    errors: list[Exception] = []

    def writer(tid: int):
        t = LakeTable(spark, root)
        for i in range(appends_each):
            df = spark.createDataFrame([(tid, i)], "tid int, seq int")
            for _attempt in range(40):
                try:
                    t.append(df)
                    break
                except ConcurrentWriteError:
                    continue  # lost the race — re-replay log, try next version
            else:
                errors.append(RuntimeError(f"writer {tid} starved"))

    threads = [
        threading.Thread(target=writer, args=(tid,)) for tid in range(n_threads)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors

    t = LakeTable(spark, root)
    total = n_threads * appends_each
    assert t.version() == total - 1  # every commit got a unique version
    assert t.read().count() == total  # no lost rows
    # every (tid, seq) pair present exactly once
    assert t.read().select("tid", "seq").distinct().count() == total
