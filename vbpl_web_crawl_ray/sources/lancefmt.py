"""Lance-format seam for the payload store (input_hint: 'Lance table of
image + caption pairs').

The reference-shaped deployment stores the image+caption table in Lance;
this container does not ship the `lance` package, so the seam follows
the repo's codec-seam pattern (sources/pdfcodec.py, sources/imaging.py):
try-import the real library at module load, dispatch to it when present,
and otherwise write the SAME logical table as a parquet directory plus a
`_lance_standin.json` manifest recording the intended Lance layout
(schema, fragment target, writer version) — so a later environment with
`lance` installed can migrate the store losslessly, and tests exercise
both branches (the real one skip-if-absent).

API mirrors what the engine needs, not the full Lance surface:
    write_table(ds, path)   -> ray.data.Dataset sink (overwrite)
    read_table(path, cols)  -> ray.data.Dataset
    format_in_use()         -> "lance" | "parquet-standin"
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import ray.data as rd

try:                                    # pragma: no cover - env-dependent
    import lance                        # noqa: F401
    _HAS_LANCE = True
except Exception:                       # pragma: no cover
    lance = None
    _HAS_LANCE = False

_MANIFEST = "_lance_standin.json"
_FRAGMENT_TARGET_ROWS = 1 << 20         # intended Lance fragment size


def format_in_use() -> str:
    return "lance" if _HAS_LANCE else "parquet-standin"


def write_table(ds: rd.Dataset, path: str) -> None:
    """Overwrite ``path`` with the dataset in the best available format.
    Both branches write from worker tasks (never the driver); overwrite
    semantics (temp-free rmtree + write) keep re-runs idempotent."""
    shutil.rmtree(path, ignore_errors=True)
    if _HAS_LANCE:                      # pragma: no cover - env-dependent
        ds.write_lance(path)
        return
    os.makedirs(path, exist_ok=True)
    ds.write_parquet(path)
    schema = ds.schema()
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump({
            "intended_format": "lance",
            "standin": "parquet",
            "fragment_target_rows": _FRAGMENT_TARGET_ROWS,
            "columns": list(schema.names),
        }, f)


def read_table(path: str, columns: list[str] | None = None) -> rd.Dataset:
    if _HAS_LANCE and not os.path.exists(os.path.join(path, _MANIFEST)):
        return rd.read_lance(path, columns=columns)  # pragma: no cover
    files = sorted(f for f in glob.glob(os.path.join(path, "*.parquet")))
    return rd.read_parquet(files, columns=columns)
