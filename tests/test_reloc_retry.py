"""Adaptive relocalization retry ladder (VERDICT r4 item 8).

The reference's reloc loop keeps iterating every candidate's RANSAC
budget across successive LOST frames until exhaustion
(src/Tracking.cc:1405-1462). The fused kernel gives the top page of BoW
candidates one shot per frame; AdaptiveRelocalizer rotates lower-ranked
pages in on consecutive failures, so a hard loss whose true match ranks
below the top page still recovers.
"""
import numpy as np

from orb_slam2_comment_tpu.models import relocalization as rl


class _FakeDB:
    pass


def test_retry_ladder_rotates_candidate_pages(monkeypatch):
    calls = []

    def fake_relocalize(m, db, frame, cfg, rank_offset=0):
        calls.append(rank_offset)
        # 12 ranked candidates; only the 7th (index 6, page 2) matches
        ok = rank_offset >= rl.RELOC_MAX_CANDIDATES
        return ok, ("T" if ok else None), ("a" if ok else None), 12

    monkeypatch.setattr(rl, "relocalize", fake_relocalize)
    ar = rl.AdaptiveRelocalizer()

    ok1, _, _ = ar(None, None, None, None)   # page 0 -> fail
    assert not ok1 and calls[-1] == 0
    ok2, _, _ = ar(None, None, None, None)   # page 1 -> success
    assert ok2 and calls[-1] == rl.RELOC_MAX_CANDIDATES
    assert ar.fail_streak == 0               # reset on success
    ok3, _, _ = ar(None, None, None, None)   # back to page 0
    assert calls[-1] == 0 and not ok3


def test_retry_ladder_wraps(monkeypatch):
    calls = []

    def fake_relocalize(m, db, frame, cfg, rank_offset=0):
        calls.append(rank_offset)
        return False, None, None, 12   # 12 candidates -> 3 pages

    monkeypatch.setattr(rl, "relocalize", fake_relocalize)
    ar = rl.AdaptiveRelocalizer()
    for _ in range(7):
        ar(None, None, None, None)
    # offsets cycle 0,5,10,0,5,10,0 over the 3 pages
    assert calls[:3] == [0, rl.RELOC_MAX_CANDIDATES,
                         2 * rl.RELOC_MAX_CANDIDATES]
    assert calls[3] == 0
