"""KinesisEnvelopeJsonlStreamReader offset contract (r5 ADVICE fix):
offsets are high-water FILENAMES, not positional indices, so a file
with a lexically earlier name appearing between commit and restart
neither shifts the replayed range nor gets double-read."""

from __future__ import annotations

import base64
import json

from kinesis_to_opensearch_lambda_spark.sources.python_datasource import (
    KinesisEnvelopeJsonlStreamReader,
)


def _write(tmp_path, name: str, payloads: list[str]) -> None:
    lines = [
        json.dumps(
            {"kinesis": {"data": base64.b64encode(p.encode()).decode()}}
        )
        for p in payloads
    ]
    (tmp_path / name).write_text("\n".join(lines) + "\n")


def _reader(tmp_path) -> KinesisEnvelopeJsonlStreamReader:
    return KinesisEnvelopeJsonlStreamReader({"path": str(tmp_path)})


def test_one_file_per_microbatch_by_name(tmp_path):
    _write(tmp_path, "part-001", ["a"])
    _write(tmp_path, "part-002", ["b", "c"])
    r = _reader(tmp_path)
    off0 = r.initialOffset()
    rows1, off1 = r.read(off0)
    assert len(list(rows1)) == 1
    assert off1 == {"pos": "part-001"}
    rows2, off2 = r.read(off1)
    assert len(list(rows2)) == 2
    assert off2 == {"pos": "part-002"}
    rows3, off3 = r.read(off2)
    assert list(rows3) == [] and off3 == off2


def test_replay_is_stable_when_earlier_name_appears(tmp_path):
    """The ADVICE scenario: batch (part-002, part-003] is committed,
    then part-000 (lexically FIRST) lands before a restart.  An index
    offset would slide the replayed slice onto the wrong file; the
    name range must still return exactly part-003's rows."""
    _write(tmp_path, "part-002", ["a"])
    _write(tmp_path, "part-003", ["b"])
    r = _reader(tmp_path)
    start, end = {"pos": "part-002"}, {"pos": "part-003"}
    before = [t[0] for t in r.readBetweenOffsets(start, end)]

    _write(tmp_path, "part-000", ["intruder"])
    after = [t[0] for t in r.readBetweenOffsets(start, end)]
    assert after == before
    assert base64.b64decode(after[0]).decode() == "b"


def test_replay_is_stable_when_a_file_is_removed(tmp_path):
    _write(tmp_path, "part-001", ["a"])
    _write(tmp_path, "part-002", ["b"])
    _write(tmp_path, "part-003", ["c"])
    r = _reader(tmp_path)
    start, end = {"pos": "part-002"}, {"pos": "part-003"}
    before = [t[0] for t in r.readBetweenOffsets(start, end)]
    (tmp_path / "part-001").unlink()  # already-committed file cleaned up
    after = [t[0] for t in r.readBetweenOffsets(start, end)]
    assert after == before


def test_late_arriving_older_name_is_skipped_not_reread(tmp_path):
    """read() past the high-water mark ignores older basenames — the
    same drop semantics as the built-in file source's processed log."""
    _write(tmp_path, "part-005", ["a"])
    r = _reader(tmp_path)
    _, off = r.read(r.initialOffset())
    assert off == {"pos": "part-005"}
    _write(tmp_path, "part-001", ["late"])
    rows, off2 = r.read(off)
    assert list(rows) == []
    assert off2 == off


def test_legacy_idx_offset_is_translated(tmp_path):
    """r6 ADVICE: a checkpoint written by the r5-era reader stored
    {"idx": N} = files-consumed count.  Restarting from it must resume
    at the (N+1)-th file of the sorted listing, not KeyError."""
    _write(tmp_path, "part-001", ["a"])
    _write(tmp_path, "part-002", ["b"])
    _write(tmp_path, "part-003", ["c"])
    r = _reader(tmp_path)
    rows, off = r.read({"idx": 1})  # part-001 already consumed
    assert [base64.b64decode(t[0]).decode() for t in rows] == ["b"]
    assert off == {"pos": "part-002"}  # upgraded shape going forward

    replay = list(r.readBetweenOffsets({"idx": 1}, {"idx": 2}))
    assert [base64.b64decode(t[0]).decode() for t in replay] == ["b"]


def test_legacy_idx_zero_and_overrun(tmp_path):
    _write(tmp_path, "part-001", ["a"])
    r = _reader(tmp_path)
    rows, off = r.read({"idx": 0})
    assert [base64.b64decode(t[0]).decode() for t in rows] == ["a"]
    # idx beyond the listing clamps to "everything consumed"
    rows2, off2 = r.read({"idx": 99})
    assert list(rows2) == [] and off2 == {"pos": "part-001"}


def test_unrecognized_offset_shape_raises(tmp_path):
    _write(tmp_path, "part-001", ["a"])
    import pytest

    with pytest.raises(ValueError, match="unrecognized offset"):
        _reader(tmp_path).read({"bogus": 1})
