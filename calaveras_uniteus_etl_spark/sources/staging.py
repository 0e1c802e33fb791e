"""Input staging sink (SURVEY.md A7; reference core/app.py:1656-1717).

The reference's upload endpoint lands multipart file bytes in the
input directory, reporting per-file success/size, and a companion
listing endpoint returns name/size/md5 for what's staged. The HTTP
transport is API plumbing; the ENGINE semantics are (a) land bytes by
filename with per-file error isolation (one bad file never aborts the
batch), (b) overwrite-by-name (re-upload replaces), and (c) a staged
listing with content identity so ingest's md5 skip (A2/A5) composes.
``discover_files``/``ingest`` consume the same directory unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Mapping

from calaveras_uniteus_etl_spark.sources.discovery import file_md5


@dataclass(frozen=True)
class StageResult:
    """Per-file landing outcome (reference FileUploadResponse)."""

    filename: str
    success: bool
    size: int
    message: str


def stage_files(input_dir: str, files: Mapping[str, bytes]) -> list[StageResult]:
    """Land ``{filename: content}`` into ``input_dir``.

    Per-file error isolation mirrors the reference loop
    (core/app.py:1661-1686): each failure is reported, the rest of the
    batch still lands. Path separators in names are rejected — the
    reference trusts UploadFile.filename; a staging API must not.
    """
    os.makedirs(input_dir, exist_ok=True)
    results: list[StageResult] = []
    for name, content in files.items():
        try:
            if not name or os.path.basename(name) != name:
                raise ValueError(f"invalid filename: {name!r}")
            with open(os.path.join(input_dir, name), "wb") as fh:
                fh.write(content)
            results.append(
                StageResult(name, True, len(content), f"File {name} staged successfully")
            )
        except Exception as exc:  # per-file isolation, reference behavior
            results.append(StageResult(name, False, 0, f"Failed to stage {name}: {exc}"))
    return results


def list_staged(input_dir: str) -> list[dict[str, object]]:
    """Staged-file inventory with md5 identity (core/app.py:1691-1717).

    Sorted by name for a deterministic listing; md5 is the same
    identity ``ingest`` uses for incremental skip, so a caller can
    predict skips before running the pipeline.
    """
    if not os.path.isdir(input_dir):
        return []
    out: list[dict[str, object]] = []
    for name in sorted(os.listdir(input_dir)):
        path = os.path.join(input_dir, name)
        if os.path.isfile(path):
            out.append({"filename": name, "size": os.path.getsize(path), "md5": file_md5(path)})
    return out
