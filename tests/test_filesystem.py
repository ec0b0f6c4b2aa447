"""FileOps unit coverage mirroring the reference's filesystem-utils tests
(TestFSUtils.scala:20-126 mergeMoveFiles cases) plus the trash and
exclusive-write primitives the commit/storage layers are built on."""

import os

import pytest

from waimak_spark.filesystem import FileOps


@pytest.fixture
def ops(spark):
    return FileOps(spark)


def _mkfiles(d, names):
    os.makedirs(d, exist_ok=True)
    for n in names:
        with open(os.path.join(d, n), "w") as f:
            f.write(n)


class TestMergeMoveFiles:
    def test_creates_destination_and_moves(self, ops, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        _mkfiles(src, ["part-0", "part-1"])
        ops.merge_move_files(src, dest)
        assert sorted(os.listdir(dest)) == ["part-0", "part-1"]
        assert os.listdir(src) == []

    def test_moves_into_existing_destination(self, ops, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        _mkfiles(src, ["part-0"])
        _mkfiles(dest, ["part-9"])
        ops.merge_move_files(src, dest)
        assert sorted(os.listdir(dest)) == ["part-0", "part-9"]

    def test_empty_source_creates_empty_destination(self, ops, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        os.makedirs(src)
        ops.merge_move_files(src, dest)
        assert os.path.isdir(dest) and os.listdir(dest) == []

    def test_filter_respected(self, ops, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        _mkfiles(src, ["part-0", "_SUCCESS", "notes.txt"])
        ops.merge_move_files(src, dest)
        assert os.listdir(dest) == ["part-0"]
        assert sorted(os.listdir(src)) == ["_SUCCESS", "notes.txt"]

    def test_directories_not_moved(self, ops, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        _mkfiles(src, ["part-0"])
        os.makedirs(os.path.join(src, "part-dir"))
        ops.merge_move_files(src, dest)
        assert os.listdir(dest) == ["part-0"]
        assert os.listdir(src) == ["part-dir"]

    def test_existing_destination_file_raises(self, ops, tmp_path):
        src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
        _mkfiles(src, ["part-0"])
        _mkfiles(dest, ["part-0"])
        with pytest.raises(IOError, match="already exists"):
            ops.merge_move_files(src, dest)
        # nothing was clobbered
        assert open(os.path.join(dest, "part-0")).read() == "part-0"

    def test_missing_source_raises(self, ops, tmp_path):
        with pytest.raises(IOError, match="does not exist"):
            ops.merge_move_files(str(tmp_path / "nope"),
                                 str(tmp_path / "dest"))

    def test_file_source_raises(self, ops, tmp_path):
        f = tmp_path / "afile"
        f.write_text("x")
        with pytest.raises(IOError, match="not a folder"):
            ops.merge_move_files(str(f), str(tmp_path / "dest"))


class TestTrashAndExclusiveWrite:
    def test_move_to_trash_and_purge_by_age(self, ops, tmp_path):
        victim = tmp_path / "victim"
        _mkfiles(str(victim), ["a"])
        trash = str(tmp_path / ".trash")
        ops.move_to_trash(str(victim), trash, ts_ms=1_000)  # ancient
        assert not victim.exists()
        kept = tmp_path / "kept"
        _mkfiles(str(kept), ["b"])
        import time

        ops.move_to_trash(str(kept), trash,
                          ts_ms=int(time.time() * 1000))  # fresh
        assert ops.purge_trash(trash, max_age_ms=86_400_000) == 1
        names = os.listdir(trash)
        assert len(names) == 1 and names[0].endswith("_kept")

    def test_write_string_exclusive_single_winner(self, ops, tmp_path):
        p = str(tmp_path / "guard" / "lock.json")
        assert ops.write_string_exclusive(p, "first") is True
        assert ops.write_string_exclusive(p, "second") is False
        assert ops.read_string(p) == "first"
