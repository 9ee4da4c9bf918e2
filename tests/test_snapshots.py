"""Snapshot log / time travel / rollback / vacuum
(:mod:`raystack.snapshots`).

Every layout-mutating op commits a snapshot; rewrites retire replaced
files into ``_history/`` instead of deleting them. These tests drive a
full lifecycle (encode → append → compact → alter) and check that every
historical state stays decodable bit-identically, that rollback restores
an earlier state exactly (files, config, manifest), and that vacuum
reclaims history without touching the retained states.
"""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from raystack import manifest as mf
from raystack import pipeline as pl
from raystack import snapshots as sn

SRC = "/root/testdata/sf0.001/documents.parquet"


def _decoded(out: str, snapshot=None) -> pd.DataFrame:
    df = pl.decode_dir(out, snapshot=snapshot).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True) \
        .reindex(sorted(df.columns), axis=1)


@pytest.fixture()
def lifecycle(ray_session, tmp_path):
    """encode(day1) → append(day2) → compact → alter(drop n_chars);
    returns (out_dir, expected DataFrame per snapshot id)."""
    t = pq.read_table(SRC, columns=["doc_id", "text", "source", "n_chars"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 300), day1)
    pq.write_table(t.slice(300), day2)
    out = str(tmp_path / "enc")
    expected = {}
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=4, add_filename=False)
    expected[1] = _decoded(out)
    pl.encode_append([day2], out, add_filename=False)
    expected[2] = _decoded(out)
    pl.compact_partitions(out)
    expected[3] = _decoded(out)
    pl.alter_layout(out, drop=["n_chars"])
    expected[4] = _decoded(out)
    return out, expected


def test_log_records_every_op(lifecycle):
    out, _ = lifecycle
    snaps = sn.list_snapshots(out)
    assert [s["id"] for s in snaps] == [1, 2, 3, 4]
    assert [s["op"] for s in snaps] == ["encode", "append", "compact",
                                       "alter"]
    assert [s["parent"] for s in snaps] == [None, 1, 2, 3]
    # rows accounted at each snapshot: append grows, alter keeps
    assert snaps[0]["rows"] == 300
    assert snaps[1]["rows"] == snaps[2]["rows"] == snaps[3]["rows"]
    # content-addressed listings: the compact→alter transition rewrote
    # every partition, so their listing shas all changed; encode→append
    # left untouched partitions sharing the same listing file
    assert snaps[2]["listing"] != snaps[3]["listing"]


def test_time_travel_decodes_every_snapshot(lifecycle):
    out, expected = lifecycle
    # later ops retired files; each historical state must decode exactly
    # as it did the moment it was committed
    for sid, want in expected.items():
        got = _decoded(out, snapshot=sid)
        pd.testing.assert_frame_equal(got, want)
    # pre-alter snapshots still carry the dropped column
    assert "n_chars" in _decoded(out, snapshot=3).columns
    assert "n_chars" not in _decoded(out, snapshot=4).columns
    with pytest.raises(KeyError):
        pl.decode_dir(out, snapshot=99).to_pandas()


def test_rollback_restores_exact_state(lifecycle):
    out, expected = lifecycle
    pl_rows = sn.rollback(out, 2)
    assert pl_rows["rows"] == len(expected[2])
    # current state == snapshot-2 state, bit-identical (incl. n_chars,
    # dropped later by the alter)
    pd.testing.assert_frame_equal(_decoded(out), expected[2])
    # the log stays append-only: a new rollback entry, not a truncation
    snaps = sn.list_snapshots(out)
    assert snaps[-1]["op"] == "rollback(2)"
    assert [s["id"] for s in snaps] == [1, 2, 3, 4, 5]
    # manifest re-finalized over the restored files
    assert mf.manifest_summary(out)["rows"] == len(expected[2])
    # roll FORWARD again: the pre-rollback state is itself a snapshot
    sn.rollback(out, 4)
    pd.testing.assert_frame_equal(_decoded(out), expected[4])
    # point lookups still route after the double rollback
    some = expected[4]["source"].iloc[:3].tolist()
    found = pl.lookup_rows(out, some).to_pandas()
    assert set(some) <= set(found["source"])


def test_rollback_restores_config(ray_session, tmp_path):
    t = pq.read_table(SRC, columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    pq.write_table(t.slice(0, 200), day1)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    pl.alter_layout(out, rename={"source": "origin"})
    assert mf.load_config(out)["url_col"] == "origin"
    sn.rollback(out, 1)
    assert mf.load_config(out)["url_col"] == "source"
    assert "source" in _decoded(out).columns


def test_diff_snapshots(lifecycle):
    out, expected = lifecycle
    d = sn.diff_snapshots(out, 1, 2)
    assert d["ops"] == ["append"]
    assert d["rows_delta"] == len(expected[2]) - len(expected[1])
    # an append only ADDS files
    for p in d["partitions_changed"].values():
        assert p["added"] and not p["removed"]
    # compact replaces: every changed partition both adds and removes
    d2 = sn.diff_snapshots(out, 2, 3)
    assert d2["ops"] == ["compact"]
    assert d2["rows_delta"] == 0
    for p in d2["partitions_changed"].values():
        assert p["added"] and p["removed"]


def test_vacuum_reclaims_history(lifecycle):
    out, expected = lifecycle
    res = sn.vacuum(out, keep_last=2)
    assert res["kept_snapshots"] == [3, 4]
    # retained snapshots still read
    pd.testing.assert_frame_equal(_decoded(out, snapshot=3), expected[3])
    pd.testing.assert_frame_equal(_decoded(out), expected[4])
    # vacuumed ones are gone from the log (loud, not wrong)
    with pytest.raises(KeyError):
        pl.decode_dir(out, snapshot=1)
    # history generations snapshot 3 no longer needs were removed
    # (compact retired into gen 3: needed by snapshots 1-2, both dropped)
    hroot = sn.history_root(out)
    gens = sorted(int(g) for g in os.listdir(hroot)) \
        if os.path.isdir(hroot) else []
    assert all(g > 3 for g in gens)
    # vacuum to only-current removes all history
    res = sn.vacuum(out, keep_last=1)
    assert res["kept_snapshots"] == [4]
    assert not os.path.isdir(sn.history_root(out))
    pd.testing.assert_frame_equal(_decoded(out), expected[4])


def test_fresh_encode_resets_lineage(ray_session, tmp_path):
    t = pq.read_table(SRC, columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    pq.write_table(t.slice(0, 200), day1)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    pl.compact_partitions(out, min_files=1)
    assert os.path.isdir(sn.history_root(out))
    # a non-resume re-encode starts a new lineage: snapshot log and
    # history of the old one are wiped with the old pages
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=2, add_filename=False)
    snaps = sn.list_snapshots(out)
    assert [s["id"] for s in snaps] == [1]
    assert not os.path.isdir(sn.history_root(out))


def test_compact_crash_replay_retires(ray_session, tmp_path):
    """A compact that crashed between installing the new base and
    retiring the replaced files leaves a journal; the next compact run
    finishes the retirement into the crashed run's generation (so the
    duplicate rows disappear and older snapshots keep resolving)."""
    import hashlib
    import json

    t = pq.read_table(SRC, columns=["doc_id", "text", "source"])
    day1 = str(tmp_path / "day1.parquet")
    day2 = str(tmp_path / "day2.parquet")
    pq.write_table(t.slice(0, 150), day1)
    pq.write_table(t.slice(150, 150), day2)
    out = str(tmp_path / "enc")
    pl.encode_partitioned_tasks([day1], out, url_col="source",
                                num_partitions=1, add_filename=False)
    pl.encode_append([day2], out, add_filename=False)
    want = _decoded(out)

    # simulate the crash: run a real compact, then resurrect the old
    # files from history next to the new base and re-write the journal
    # as if retirement never happened
    pl.compact_partitions(out)
    part_dir = os.path.join(out, "pages", "part_key=0")
    gen_dirs = os.listdir(sn.history_root(out))
    assert len(gen_dirs) == 1
    gen = int(gen_dirs[0])
    hist_part = os.path.join(sn.history_root(out), str(gen), "part_key=0")
    resurrected = sorted(os.listdir(hist_part))
    for f in resurrected:
        os.replace(os.path.join(hist_part, f), os.path.join(part_dir, f))
    base_name = f"part-c{gen}.parquet"
    digest = hashlib.sha1(
        open(os.path.join(part_dir, base_name), "rb").read()).hexdigest()
    with open(os.path.join(part_dir, ".compact-journal.json"), "w") as fh:
        json.dump({"digest": digest, "base": base_name, "gen": gen,
                   "retire": resurrected}, fh)

    # the journal forces a revisit even though min_files isn't met;
    # replay retires the duplicates, then the partition re-compacts
    pl.compact_partitions(out, min_files=99)
    got = _decoded(out)
    pd.testing.assert_frame_equal(got, want)
    # the resurrected files are back in history, not deleted
    assert sorted(os.listdir(hist_part)) == resurrected


def test_snapshot_decode_column_pruning(lifecycle):
    out, expected = lifecycle
    got = pl.decode_dir(out, columns=["doc_id", "n_chars"],
                        snapshot=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = expected[2][["doc_id", "n_chars"]]
    pd.testing.assert_frame_equal(
        got.reindex(sorted(got.columns), axis=1),
        want.reindex(sorted(want.columns), axis=1))
