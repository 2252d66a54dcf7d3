"""Zip extraction source (SURVEY S9) + filename-date normalization (F11).

The reference pulls monthly-update zips from S3, selects the one correct
inner ``.txt`` member by name, and re-uploads it
(``minio_extract_s3_zip_files.py:96-139``), normalizing filenames like
``PPMS_update_28_Feb_2017.txt`` → ``2017_02_28`` (:62-138).

Spark-first: zips are listed/streamed via the FS layer; extraction of one
member is driver-side (a zip is a single object — there is no intra-file
parallelism to exploit), then the extracted text lands back in the store
where the distributed CSV reader takes over. For *many* zips, parallelize
across files with ``spark.read.format('binaryFile')`` + ``mapInPandas``.
"""

from __future__ import annotations

import io
import re
import zipfile

MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

_FNAME_RE = re.compile(
    r"PPMS_update_(\d{1,2})_([A-Za-z]{3})[a-z]*_(\d{4})", re.IGNORECASE
)


def normalize_update_filename(name: str) -> str | None:
    """F11: ``PPMS_update_{day}_{Mon}_{year}...`` → ``{year}_{mm}_{dd}``."""
    m = _FNAME_RE.search(name)
    if not m:
        return None
    day, mon, year = m.groups()
    month = MONTHS.get(mon.lower()[:3])
    if month is None:
        return None
    return f"{year}_{month:02d}_{int(day):02d}"


def extract_member(
    zip_bytes: bytes, suffix: str = ".txt", expect_one: bool = True
) -> tuple[str, bytes]:
    """Select + extract the one matching member (reference errors when the
    zip doesn't contain exactly the expected file)."""
    with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
        members = [n for n in zf.namelist() if n.lower().endswith(suffix)]
        if expect_one and len(members) != 1:
            raise ValueError(
                f"expected exactly one {suffix} member, found {members}"
            )
        name = members[0]
        return name, zf.read(name)


def extract_zip_to_store(fs, zip_path: str, dest_dir: str) -> str:
    """S9 end-to-end: read zip from the store, extract the .txt member,
    write it back under the normalized date name. Returns the new path."""
    name, data = extract_member(fs.get(zip_path))
    norm = normalize_update_filename(name) or name.rsplit("/", 1)[-1]
    dest = f"{dest_dir.rstrip('/')}/pp-monthly-update-{norm}.txt"
    fs.put_once(dest, data)
    return dest
