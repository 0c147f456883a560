"""Bench-harness protocol unit tests (no Spark, subprocess mocked).

ADVICE r6: the bonus-pass retry must be SYMMETRIC — when a level pair
is inconsistent (higher parallelism slower in absolute wall), every
level gets the extra attempts, and the artifact records equal
``n_attempts`` per level so a gate pass earned via retries is visible.
"""

import bench


def _fake_stage(walls_by_master):
    """run_subprocess_stage stand-in: pops the next scripted wall."""

    def run(master, pages_dir, runs=2):
        wall = walls_by_master[master].pop(0)
        return {
            "master": master,
            "wall_sec": wall,
            "wall_sec_runs": [wall, wall],
            "docs_per_sec": round(1000.0 / wall, 1),
        }

    return run


def test_consistent_ladder_no_retries(monkeypatch):
    walls = {
        "local[2]": [8.0] * 10,
        "local[8]": [2.5] * 10,
        "local[32]": [1.0] * 10,
    }
    monkeypatch.setattr(bench, "run_subprocess_stage", _fake_stage(walls))
    best = bench.run_levels_interleaved("ignored", (2, 8, 32), passes=2)
    # 2 passes x 2 runs, no bonus rounds
    assert all(best[n]["n_attempts"] == 4 for n in (2, 8, 32))
    assert best[32]["wall_sec"] == 1.0


def test_inconsistent_pair_retries_whole_ladder(monkeypatch):
    # local[32] poisoned in the first two passes (slower than local[8]),
    # clean in the bonus round; every level must receive the same
    # number of attempts (equal-N minima).
    walls = {
        "local[2]": [8.0] * 10,
        "local[8]": [2.5] * 10,
        "local[32]": [9.0, 9.0, 1.0] + [1.0] * 7,
    }
    monkeypatch.setattr(bench, "run_subprocess_stage", _fake_stage(walls))
    best = bench.run_levels_interleaved("ignored", (2, 8, 32), passes=2)
    counts = {n: best[n]["n_attempts"] for n in (2, 8, 32)}
    # one bonus FULL pass fixed the ladder: 3 calls x 2 runs everywhere
    assert counts == {2: 6, 8: 6, 32: 6}
    assert best[32]["wall_sec"] == 1.0
    assert best[2]["wall_sec"] == 8.0


def test_persistent_inconsistency_bounded_and_symmetric(monkeypatch):
    # local[32] never recovers: retries are bounded (3 bonus rounds)
    # and attempts stay equal across levels.
    walls = {
        "local[2]": [8.0] * 12,
        "local[8]": [2.5] * 12,
        "local[32]": [9.0] * 12,
    }
    monkeypatch.setattr(bench, "run_subprocess_stage", _fake_stage(walls))
    best = bench.run_levels_interleaved("ignored", (2, 8, 32), passes=2)
    counts = {best[n]["n_attempts"] for n in (2, 8, 32)}
    assert len(counts) == 1  # equal everywhere
    assert counts.pop() == (2 + 3) * 2  # 2 passes + 3 bonus rounds, 2 runs each
