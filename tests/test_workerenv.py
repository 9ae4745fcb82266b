"""r6: the zipimport invalidation guard applied at package import.

PySpark's worker loop calls importlib.invalidate_caches() before every
task; on CPython 3.11 every cached zipimporter re-reads its whole zip
central directory (~0.4 s/task measured). The guard skips the re-read
while the archive's (mtime_ns, size) is unchanged — these tests pin the
two semantic requirements: unchanged archives are served from cache,
and a MODIFIED archive is re-read (new members become visible)."""

import os
import sys
import time
import zipfile
import zipimport

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import go_mysql_elasticsearch_spark  # noqa: F401  (applies the guard)


def test_guard_is_applied():
    assert getattr(zipimport.zipimporter, "_gmes_stat_guard", False)


def test_changed_zip_is_rereaded(tmp_path):
    p = str(tmp_path / "m.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("mod_a.py", "x = 1")
    zi = zipimport.zipimporter(p)
    zi.invalidate_caches()
    assert "mod_a.py" in zi._files
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    with zipfile.ZipFile(p, "a") as z:
        z.writestr("mod_b.py", "y = 2")
    zi.invalidate_caches()
    assert "mod_b.py" in zi._files  # stat changed → directory re-read


def test_unchanged_zip_skips_reread(tmp_path, monkeypatch):
    p = str(tmp_path / "m.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("mod_a.py", "x = 1")
    zi = zipimport.zipimporter(p)
    zi.invalidate_caches()  # records the stat marker
    calls = {"n": 0}
    real = zipimport._read_directory

    def counting(archive):
        calls["n"] += 1
        return real(archive)

    monkeypatch.setattr(zipimport, "_read_directory", counting)
    zi.invalidate_caches()
    zi.invalidate_caches()
    assert calls["n"] == 0  # unchanged archive: no directory re-read
