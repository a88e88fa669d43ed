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

import pyarrow as pa
import ray.data


@dataclass
class FileSlice:
    path: str
    mtime: float  # seconds since epoch


def list_files(
    root: str, pattern: str = "**/*.parquet", min_mtime: float | None = None,
    strict: bool = False,
) -> list[FileSlice]:
    """Candidate file slices newer than the cursor (metadata-only).

    Default is ``mtime >= cursor`` (``strict=False``): a file written in the
    same mtime tick as the listing would be skipped FOREVER under a strict
    ``>`` — the same-timestamp race the reference IncrementalFileStream
    guards with ``>=`` plus history (``source-s3/.../stream.py:306-420``).
    Boundary files re-read every sync are at-least-once; dedup downstream
    (or the idempotent append_dedup merge) absorbs them."""
    out = []
    for p in sorted(_glob.glob(os.path.join(root, pattern), recursive=True)):
        mt = os.path.getmtime(p)
        if min_mtime is None or (mt > min_mtime if strict else mt >= min_mtime):
            out.append(FileSlice(p, mt))
    return out


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
    paths = [s.path for s in slices]

    # ONE dataset over all files (round-1 fix: no O(files) dataset union) —
    # Ray's include_paths stamps each row's source file; mtimes join in-task
    # from a broadcast path→mtime map.
    kwargs = {"include_paths": True} if stamp_provenance else {}
    exts = {os.path.splitext(p)[1].lower() for p in paths}
    if exts <= {".json", ".jsonl"}:
        ds = ray.data.read_json(paths, **kwargs)
    elif exts == {".csv"}:
        ds = ray.data.read_csv(paths, **kwargs)
    elif exts == {".parquet"}:
        ds = ray.data.read_parquet(paths, partitioning=None, **kwargs)
    else:
        raise ValueError(
            f"unsupported or mixed file extensions {sorted(exts)} for pattern "
            f"{pattern!r} (supported: .parquet, .json/.jsonl, .csv)"
        )

    if stamp_provenance:
        import ray as _ray

        mt_ref = _ray.put({s.path: s.mtime for s in slices})

        def stamp(t: pa.Table) -> pa.Table:
            mt = _ray.get(mt_ref)
            file_paths = t["path"]
            mtimes = pa.array(
                [mt.get(p) for p in file_paths.to_pylist()], pa.float64()
            )
            t = t.drop_columns(["path"])
            t = t.append_column("_ab_source_file", file_paths)
            return t.append_column("_ab_source_file_last_modified", mtimes)

        ds = ds.map_batches(stamp, batch_format="pyarrow")
    return ds, new_cursor
