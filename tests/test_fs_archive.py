"""FS object ops (S5-S8, S15) + zip extraction source (S9, F11)."""

from __future__ import annotations

import io
import zipfile

import pytest

from land_registry_data_ingestion_spark.sources.archive import (
    extract_member,
    extract_zip_to_store,
    normalize_update_filename,
)
from land_registry_data_ingestion_spark.sources.fs import FS


@pytest.fixture()
def fs(spark, tmp_path):
    return FS(spark, str(tmp_path))


def test_put_get_copy_move_delete(fs, tmp_path):
    root = str(tmp_path)
    fs.put_once(f"{root}/tmp/a.txt", b"hello")
    assert fs.get(f"{root}/tmp/a.txt") == b"hello"
    # error-if-exists guard (S5)
    with pytest.raises(FileExistsError):
        fs.put_once(f"{root}/tmp/a.txt", b"x")
    # archive move: copy tmp→archive then source gone (S7)
    fs.move(f"{root}/tmp/a.txt", f"{root}/archive/a.txt")
    assert fs.exists(f"{root}/archive/a.txt")
    assert not fs.exists(f"{root}/tmp/a.txt")
    # GC delete (S8)
    fs.put_once(f"{root}/tmp/b.txt", b"junk")
    assert fs.delete(f"{root}/tmp/b.txt")
    assert not fs.exists(f"{root}/tmp/b.txt")
    # listing (S15)
    assert [p for p in fs.listdir(root) if p.endswith(".txt")] == [
        f"file:{root}/archive/a.txt"
    ]


def _zip_with(names_to_bytes: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for n, b in names_to_bytes.items():
            zf.writestr(n, b)
    return buf.getvalue()


def test_normalize_update_filename():
    assert normalize_update_filename("PPMS_update_28_Feb_2017.txt") == "2017_02_28"
    assert normalize_update_filename("PPMS_update_3_December_2015.txt") == "2015_12_03"
    assert normalize_update_filename("random.txt") is None


def test_extract_member_selects_single_txt():
    z = _zip_with({"PPMS_update_5_Mar_2016.txt": b"data", "readme.md": b"x"})
    name, data = extract_member(z)
    assert name == "PPMS_update_5_Mar_2016.txt" and data == b"data"
    with pytest.raises(ValueError):
        extract_member(_zip_with({"a.txt": b"1", "b.txt": b"2"}))


def test_extract_zip_to_store(fs, tmp_path):
    root = str(tmp_path)
    z = _zip_with({"PPMS_update_5_Mar_2016.txt": b"csvdata"})
    fs.put_once(f"{root}/zips/m.zip", z)
    dest = extract_zip_to_store(fs, f"{root}/zips/m.zip", f"{root}/extracted")
    assert dest.endswith("pp-monthly-update-2016_03_05.txt")
    assert fs.get(dest) == b"csvdata"
