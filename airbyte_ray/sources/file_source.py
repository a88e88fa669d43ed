"""Incremental file source — the S3/file-connector analog.

Reference: ``IncrementalFileStream`` (``source-s3/.../stream.py:306-420``):
list files, cursor = ``_ab_source_file_last_modified``, slices = file
groups; only files modified after the saved cursor are read on an
incremental sync.

Here: list parquet/json/csv files under a directory, filter by mtime >
cursor (listing is metadata-only), read the survivors as one Dataset with
per-row provenance columns (``_ab_source_file``, ``_ab_source_file_last_modified``),
and hand back the new cursor to commit after the sink lands.  File-level
parallelism is Ray's own (one-or-more read tasks per file).
"""

from __future__ import annotations

import glob as _glob
import os
from dataclasses import dataclass
from functools import partial

import pyarrow as pa
import ray.data


@dataclass
class FileSlice:
    path: str
    mtime: float  # seconds since epoch


def list_files(
    root: str, pattern: str = "**/*.parquet", min_mtime: float | None = None
) -> list[FileSlice]:
    """Candidate file slices newer than the cursor (metadata-only)."""
    out = []
    for p in sorted(_glob.glob(os.path.join(root, pattern), recursive=True)):
        mt = os.path.getmtime(p)
        if min_mtime is None or mt > min_mtime:
            out.append(FileSlice(p, mt))
    return out


def _stamp(t: pa.Table, path: str, mtime: float) -> pa.Table:
    n = t.num_rows
    t = t.append_column("_ab_source_file", pa.array([path] * n))
    return t.append_column(
        "_ab_source_file_last_modified",
        pa.array([mtime] * n, pa.float64()),
    )


def read_files_incremental(
    root: str,
    pattern: str = "**/*.parquet",
    cursor: float | None = None,
    stamp_provenance: bool = True,
) -> tuple[ray.data.Dataset | None, float | None]:
    """(dataset of files newer than cursor, new cursor).  Returns (None,
    cursor) when nothing is new.  Commit the returned cursor only after the
    downstream write lands (committed-after-flush)."""
    slices = list_files(root, pattern, min_mtime=cursor)
    if not slices:
        return None, cursor
    new_cursor = max(s.mtime for s in slices)

    if pattern.endswith(".json"):
        ds = ray.data.read_json([s.path for s in slices])
    elif pattern.endswith(".csv"):
        ds = ray.data.read_csv([s.path for s in slices])
    else:
        ds = ray.data.read_parquet([s.path for s in slices], partitioning=None)

    if stamp_provenance:
        # per-file datasets so provenance is exact; union preserves laziness
        parts = []
        for s in slices:
            if pattern.endswith(".json"):
                d = ray.data.read_json(s.path)
            elif pattern.endswith(".csv"):
                d = ray.data.read_csv(s.path)
            else:
                d = ray.data.read_parquet(s.path, partitioning=None)
            parts.append(
                d.map_batches(partial(_stamp, path=s.path, mtime=s.mtime), batch_format="pyarrow")
            )
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
    return ds, new_cursor
